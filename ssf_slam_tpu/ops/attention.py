"""Fused dual-softmax patch attention — Pallas TPU kernel.

The cost volume's cross-attention (PointConvTransFlowV2, soflow.py:420-461)
computes, independently per query point, over its K-neighbor patch:

    W   = softmax_rows(QK^T) * softmax_cols(QK^T)      # [K, K]
    q'  = Q + W  K                                     # attended features
    k'  = K + Q^T-attended via W (columns)

On XLA this lowers to a chain of batched tiny [K, K] einsums + two softmax
stacks, each materializing [N, K, K] / [N, K, C] tensors in HBM (~1 ms per
forward at production scale, measured). The kernel runs the whole chain
per 256-point tile with everything VMEM-resident.

Differentiability: the kernel carries a custom VJP whose backward re-runs
the XLA reference implementation under ``jax.vjp`` — bit-identical gradient
semantics to the pure-XLA path, so training can use the fused forward too.

STATUS — measured negative, NOT wired into the model: in isolation the
kernel beats the XLA chain 0.27 vs 0.7 ms at the l0 scale (8192x16x64
bf16), but swapping it into the cost volumes REGRESSED end-to-end
throughput (91 -> 85 scans/s, all-levels or l0-only alike). XLA fuses
these einsums into the adjacent softmax/weightnet elementwise chain and
overlaps them with the neighbor kernels; an opaque pallas call breaks both.
Kept (with equivalence+grad tests) as the starting point for a FUTURE
bigger fusion — attention + weightnet + aggregation in one kernel would
remove enough HBM round-trips to clear the fusion-boundary cost.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_TQ = 256  # query tile


def attention_xla(q_feat: Array, k_feat: Array) -> tuple[Array, Array]:
    """Reference implementation ([.., N, K, C] -> attended pair)."""
    w = jnp.einsum("...kc,...jc->...kj", q_feat, k_feat,
                   preferred_element_type=jnp.float32)
    w = jax.nn.softmax(w, axis=-2) * jax.nn.softmax(w, axis=-1)
    q_att = q_feat + jnp.einsum(
        "...kj,...jc->...kc", w, k_feat,
        preferred_element_type=jnp.float32).astype(q_feat.dtype)
    k_att = k_feat + jnp.einsum(
        "...jc,...jk->...kc", q_feat, w,
        preferred_element_type=jnp.float32).astype(k_feat.dtype)
    return q_att, k_att


def _kernel_body(k: int, c: int, q_dtype, k_dtype):
    def kernel(q_ref, k_ref, qa_ref, ka_ref):
        q = q_ref[:].astype(jnp.float32)  # [TQ, K, C]
        kk = k_ref[:].astype(jnp.float32)
        dn = (((2,), (2,)), ((0,), (0,)))  # contract C, batch TQ
        w = jax.lax.dot_general(q, kk, dimension_numbers=dn,
                                preferred_element_type=jnp.float32)
        # dual softmax, rows (axis -2) x cols (axis -1)
        e1 = jnp.exp(w - jnp.max(w, axis=-2, keepdims=True))
        s1 = e1 / jnp.sum(e1, axis=-2, keepdims=True)
        e2 = jnp.exp(w - jnp.max(w, axis=-1, keepdims=True))
        s2 = e2 / jnp.sum(e2, axis=-1, keepdims=True)
        w = s1 * s2
        dn_av = (((2,), (1,)), ((0,), (0,)))  # [TQ,K,K] x [TQ,K,C]
        qa = q + jax.lax.dot_general(w, kk, dimension_numbers=dn_av,
                                     preferred_element_type=jnp.float32)
        dn_tv = (((1,), (1,)), ((0,), (0,)))  # w^T applied to q
        ka = kk + jax.lax.dot_general(w, q, dimension_numbers=dn_tv,
                                      preferred_element_type=jnp.float32)
        qa_ref[:] = qa.astype(q_dtype)
        ka_ref[:] = ka.astype(k_dtype)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _attention_pallas_2d(q_feat: Array, k_feat: Array,
                         interpret: bool = False):
    """[N, K, C] single-cloud kernel call (vmapped over batch)."""
    n, k, c = q_feat.shape
    spec = pl.BlockSpec((_TQ, k, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)
    qa, ka = pl.pallas_call(
        _kernel_body(k, c, q_feat.dtype, k_feat.dtype),
        grid=(n // _TQ,),
        in_specs=[spec, spec],
        out_specs=[spec, spec],
        out_shape=[
            jax.ShapeDtypeStruct((n, k, c), q_feat.dtype),
            jax.ShapeDtypeStruct((n, k, c), k_feat.dtype),
        ],
        interpret=interpret,
    )(q_feat, k_feat)
    return qa, ka


def _fwd_impl(q_feat, k_feat, interpret):
    f = functools.partial(_attention_pallas_2d, interpret=interpret)
    for _ in range(q_feat.ndim - 3):
        f = jax.vmap(f)
    return f(q_feat, k_feat)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _attention_fused(q_feat, k_feat, interpret):
    return _fwd_impl(q_feat, k_feat, interpret)


def _attention_fused_fwd(q_feat, k_feat, interpret):
    return _fwd_impl(q_feat, k_feat, interpret), (q_feat, k_feat)


def _attention_fused_bwd(interpret, res, cts):
    # gradient semantics identical to the XLA path: re-linearize the
    # reference implementation at the saved inputs
    q_feat, k_feat = res
    _, vjp = jax.vjp(attention_xla, q_feat, k_feat)
    return vjp(cts)


_attention_fused.defvjp(_attention_fused_fwd, _attention_fused_bwd)


def attention_fused(
    q_feat: Array,  # [.., N, K, C]; N must be a multiple of 256
    k_feat: Array,
    interpret: bool = False,
) -> tuple[Array, Array]:
    """Direct entry to the fused kernel (see STATUS note above: kept as a
    measured-negative building block, not dispatched by the model)."""
    return _attention_fused(q_feat, k_feat, interpret)


# ---------------------------------------------------------------------------
# attention + weightnet + forward-aggregation SUPER-fusion
# ---------------------------------------------------------------------------
#
# The cost volume's whole post-grouping chain (soflow.py:420-486) between
# the two MLP stacks and the backward scatter:
#
#     q_att, k_att = dual_softmax_attention(q_feat, k_feat)
#     w_q = weightnet(q_att);  w_k = weightnet(k_att)     # 3-layer MLP -> 1
#     weights1 = softmax_K(w_q)
#     cost_fwd = sum_K(weights1 * q_cost)
#
# in ONE kernel per 256-query tile, everything VMEM-resident. This is the
# "larger fusion" the STATUS note above calls for: the isolated attention
# kernel lost end-to-end because its boundaries broke XLA's fusion/overlap;
# here the boundary encloses the whole chain, so the [N, K, C] attended
# tensors, the [N, K, K] dual-softmax products, and the [N, K] logits never
# touch HBM at all. The weightnet's inference-mode BatchNorms are affine and
# are FOLDED into the Dense weights by the caller (fold_weightnet), so the
# kernel sees a plain 3-layer MLP.
#
# Training keeps the XLA chain (BN needs batch stats); the custom VJP
# backward re-linearizes the XLA reference anyway, so gradients through the
# fused forward are bit-identical to the unfused path.


def fold_weightnet(params: dict, batch_stats: dict,
                   eps: float = 1e-3) -> tuple:
    """Fold inference BatchNorms into the weightnet Dense weights.

    ``params``/``batch_stats`` are the cost-volume scope entries created by
    the weightnet Sequential (Dense_0, BatchNorm_0, Dense_1, BatchNorm_1,
    Dense_2). Returns (W1, b1, W2, b2, W3, b3) with
    ``y = scale*(xW - mean)/sqrt(var+eps) + bias`` rewritten as
    ``y = x @ (W*f) + (bias - mean*f)``, f = scale/sqrt(var+eps).
    """

    def fold(dense, bn, stats):
        f = bn["scale"] / jnp.sqrt(stats["var"] + eps)
        return dense["kernel"] * f[None, :], bn["bias"] - stats["mean"] * f

    w1, b1 = fold(params["Dense_0"], params["BatchNorm_0"],
                  batch_stats["BatchNorm_0"])
    w2, b2 = fold(params["Dense_1"], params["BatchNorm_1"],
                  batch_stats["BatchNorm_1"])
    return (w1, b1, w2, b2, params["Dense_2"]["kernel"],
            params["Dense_2"]["bias"])


def cost_attention_xla(q_feat: Array, k_feat: Array, q_cost: Array,
                       wn: tuple) -> tuple[Array, Array]:
    """XLA reference of the fused chain ([.., N, K, C] inputs).

    Returns (cost_fwd [.., N, C], w_k logits [.., N, K]). Weightnet matmuls
    run in the feature dtype (bf16 in production), accumulating in f32 —
    same numerics as the Flax Dense(dtype=bf16) stack they replace.
    """
    w1, b1, w2, b2, w3, b3 = wn
    q_att, k_att = attention_xla(q_feat, k_feat)

    def weightnet(x):
        dt = x.dtype
        h = jax.nn.relu(
            jnp.dot(x, w1.astype(dt), preferred_element_type=jnp.float32)
            + b1).astype(dt)
        h = jax.nn.relu(
            jnp.dot(h, w2.astype(dt), preferred_element_type=jnp.float32)
            + b2).astype(dt)
        return (jnp.dot(h, w3.astype(dt),
                        preferred_element_type=jnp.float32)
                + b3)[..., 0]

    w_q = weightnet(q_att)  # [.., N, K]
    w_k = weightnet(k_att)
    weights1 = jax.nn.softmax(w_q, axis=-1)[..., None]
    cost_fwd = jnp.sum(weights1 * q_cost.astype(jnp.float32), axis=-2)
    return cost_fwd.astype(q_cost.dtype), w_k

def _cost_attention_kernel_body(k: int, c: int, dtype):
    def kernel(q_ref, k_ref, qc_ref, w1_ref, b1_ref, w2_ref, b2_ref, w3_ref,
               b3_ref, cf_ref, wk_ref):
        # matmul MULTIPLICANDS stay in the feature dtype (bf16 in prod —
        # f32 MXU passes are 4-8x slower); accumulation is f32 throughout
        q = q_ref[:]  # [TQ, K, C]
        kk = k_ref[:]
        dn = (((2,), (2,)), ((0,), (0,)))  # contract C, batch TQ
        w = jax.lax.dot_general(q, kk, dimension_numbers=dn,
                                preferred_element_type=jnp.float32)
        e1 = jnp.exp(w - jnp.max(w, axis=-2, keepdims=True))
        s1 = e1 / jnp.sum(e1, axis=-2, keepdims=True)
        e2 = jnp.exp(w - jnp.max(w, axis=-1, keepdims=True))
        s2 = e2 / jnp.sum(e2, axis=-1, keepdims=True)
        w = (s1 * s2).astype(dtype)
        dn_av = (((2,), (1,)), ((0,), (0,)))
        qa = (q.astype(jnp.float32)
              + jax.lax.dot_general(w, kk, dimension_numbers=dn_av,
                                    preferred_element_type=jnp.float32)
              ).astype(dtype)
        dn_tv = (((1,), (1,)), ((0,), (0,)))
        ka = (kk.astype(jnp.float32)
              + jax.lax.dot_general(w, q, dimension_numbers=dn_tv,
                                    preferred_element_type=jnp.float32)
              ).astype(dtype)

        tq = qa.shape[0]
        w1 = w1_ref[:].astype(dtype)
        w2 = w2_ref[:].astype(dtype)
        w3 = w3_ref[:].astype(dtype)

        def weightnet(x):  # [TQ, K, C] -> [TQ, K] logits
            x2 = x.reshape(tq * k, c)
            h = jnp.maximum(
                jnp.dot(x2, w1,
                        preferred_element_type=jnp.float32) + b1_ref[:],
                0.0).astype(dtype)
            h = jnp.maximum(
                jnp.dot(h, w2,
                        preferred_element_type=jnp.float32) + b2_ref[:],
                0.0).astype(dtype)
            o = jnp.dot(h, w3,
                        preferred_element_type=jnp.float32) + b3_ref[:]
            return o.reshape(tq, k)

        wq = weightnet(qa)
        wk = weightnet(ka)
        ew = jnp.exp(wq - jnp.max(wq, axis=1, keepdims=True))
        wt = ew / jnp.sum(ew, axis=1, keepdims=True)  # softmax over K
        cf = jnp.sum(wt[:, :, None] * qc_ref[:].astype(jnp.float32), axis=1)
        cf_ref[:] = cf.astype(cf_ref.dtype)
        wk_ref[:] = wk.astype(jnp.float32)

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cost_attention_2d(q_feat, k_feat, q_cost, w1, b1, w2, b2, w3, b3,
                       interpret: bool = False):
    n, k, c = q_feat.shape
    c2 = w2.shape[-1]
    tile = pl.BlockSpec((_TQ, k, c), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                            memory_space=pltpu.VMEM)

    cf, wk = pl.pallas_call(
        _cost_attention_kernel_body(k, c, q_feat.dtype),
        grid=(n // _TQ,),
        in_specs=[tile, tile, tile, full((c, c)), full((1, c)),
                  full((c, c2)), full((1, c2)), full((c2, 1)), full((1, 1))],
        out_specs=[
            pl.BlockSpec((_TQ, c), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TQ, k), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, c), q_cost.dtype),
            jax.ShapeDtypeStruct((n, k), jnp.float32),
        ],
        interpret=interpret,
    )(q_feat, k_feat, q_cost, w1, b1[None, :], w2, b2[None, :], w3,
      b3[None, :])
    return cf, wk


def _cost_attention_impl(q_feat, k_feat, q_cost, wn, interpret):
    f = functools.partial(_cost_attention_2d, interpret=interpret)
    for _ in range(q_feat.ndim - 3):
        f = jax.vmap(f, in_axes=(0, 0, 0) + (None,) * 6)
    return f(q_feat, k_feat, q_cost, *wn)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _cost_attention(q_feat, k_feat, q_cost, wn, interpret):
    return _cost_attention_impl(q_feat, k_feat, q_cost, wn, interpret)


def _cost_attention_fwd(q_feat, k_feat, q_cost, wn, interpret):
    out = _cost_attention_impl(q_feat, k_feat, q_cost, wn, interpret)
    return out, (q_feat, k_feat, q_cost, wn)


def _cost_attention_bwd(interpret, res, cts):
    q_feat, k_feat, q_cost, wn = res
    _, vjp = jax.vjp(cost_attention_xla, q_feat, k_feat, q_cost, wn)
    return vjp(cts)


_cost_attention.defvjp(_cost_attention_fwd, _cost_attention_bwd)


def cost_attention_fused(
    q_feat: Array,  # [.., N, K, C]; N must be a multiple of 256
    k_feat: Array,  # [.., N, K, C]
    q_cost: Array,  # [.., N, K, C]
    wn: tuple,  # fold_weightnet output
    interpret: bool = False,
) -> tuple[Array, Array]:
    """Fused chain: returns (cost_fwd [.., N, C], w_k logits [.., N, K])."""
    return _cost_attention(q_feat, k_feat, q_cost, wn, interpret)
