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
