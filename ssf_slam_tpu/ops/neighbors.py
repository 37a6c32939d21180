"""Neighbor-engine dispatch: Morton-banded Pallas kernels vs pure XLA.

The scene-flow network's runtime is dominated by kNN selection, neighborhood
gathers, and the backward-cost scatter (docs/PERFORMANCE.md). This module is
the single switch point between:

- the **banded** fast path (ops/banded.py): Morton-sorted clouds, Pallas
  kernels with VMEM-resident bands, one-hot MXU grouping/scatter; and
- the **xla** fallback (ops/knn.py + ops/grouping.py + segment ops): exact
  semantics, any shape, used for small levels and on CPU.

Backend selection is static per call site (shapes are static under jit):
``band_params(n, m, k)`` returns the banded tiling or None. Every dispatch
function is batched ([B, N, ...]) and differentiable. On the banded path the
custom VJPs mirror the reference's pointnet2 autograd surface exactly:

- knn indices and distances carry NO gradient (the CUDA ``knn`` op has no
  backward — utils/utils.py:229);
- grouping backpropagates to the grouped FEATURES only
  (``grouping_operation`` backward, as used at soflow.py:392-409);
- inverse-distance interpolation backpropagates through the features with
  the weights treated as constants (``three_interpolate`` backward);
- the scatter-softmax aggregation is fully differentiable in both values and
  logits (torch_scatter ``scatter_softmax``/``scatter_sum``,
  soflow.py:474-481).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ssf_slam_tpu.ops import banded
from ssf_slam_tpu.ops.grouping import group_points
from ssf_slam_tpu.ops.interp import idw_weights
from ssf_slam_tpu.ops.knn import knn as xla_knn
from ssf_slam_tpu.ops.morton import morton_codes

Array = jax.Array

# banded pays off only when the [N, M] distance matrix would be large
_MIN_WORK = 1 << 20


def band_params(n: int, m: int, k: int) -> tuple[int, int, int] | None:
    """Static banded-tiling choice: (query_tile, wblk, n_blocks) or None.

    None means the call must take the XLA path: the problem is too small to
    amortize kernel launches, or the shapes don't tile.
    """
    if k > 32 or n * m < _MIN_WORK or n % 256:
        return None
    if m % 256 == 0 and m // 256 >= 3:
        return (256, 256, 3)
    if m % 128 == 0 and m // 128 >= 3:
        return (256, 128, 3)
    return None


def cloud_box(*clouds: Array) -> tuple[Array, Array]:
    """Per-batch-element isotropic quantization box covering all clouds.

    Returns (origin [..., 3], scale [...]): the Morton box every banded op
    in one forward pass must share. Adaptive boxes keep full 10-bit
    resolution wherever the scene sits (fixed boxes clip and lose locality).
    """
    both = jnp.concatenate(clouds, axis=-2)
    origin = jnp.min(both, axis=-2)  # [..., 3]
    scale = jnp.max(jnp.max(both, axis=-2) - origin, axis=-1) + 1e-3
    return origin, scale


def _box_slice(box, for_points: Array):
    """Broadcast a batched box against [..., N, 3] points."""
    if box is None:
        return None, None
    origin, scale = box
    return origin[..., None, :], scale[..., None, None]


def morton_sort(points: Array, extent: float = 64.0,
                box=None) -> tuple[Array, Array]:
    """Sort points ([..., N, 3]) by Morton code. Returns (sorted, perm)."""
    origin, scale = _box_slice(box, points)
    codes = morton_codes(points, extent, origin=origin, scale=scale)
    perm = jnp.argsort(codes, axis=-1)
    return jnp.take_along_axis(points, perm[..., None], axis=-2), perm


def invert_permutation(perm: Array) -> Array:
    return jnp.argsort(perm, axis=-1)


def _vmapn(f, ndim: int):
    for _ in range(ndim):
        f = jax.vmap(f)
    return f


def make_plan(query: Array, points: Array, params: tuple, extent: float,
              box=None):
    """Batched plan_bands. The plan depends only on (query, points) geometry
    and is reusable across knn/group/regroup/scatter calls on that pair."""
    qt, wblk, nb = params

    if box is None:
        def one(q, p):
            return banded.plan_bands(q, p, None, qt, wblk, nb, extent)

        return _vmapn(one, query.ndim - 2)(query, points)

    def one_box(q, p, o, sc):
        return banded.plan_bands(q, p, None, qt, wblk, nb, extent,
                                 box=(o, sc))

    return _vmapn(one_box, query.ndim - 2)(query, points, box[0], box[1])


# ---------------------------------------------------------------------------
# knn (indices only) — non-differentiable everywhere, like the CUDA op
# ---------------------------------------------------------------------------


def nn_knn(
    query: Array, points: Array, k: int,
    backend: str = "xla", extent: float = 64.0,
    plan=None, params=None, box=None,
) -> tuple[Array, Array]:
    """kNN dispatch: [.., N, 3] x [.., M, 3] -> (sqdist, idx) [.., N, k]."""
    n, m = query.shape[-2], points.shape[-2]
    if backend == "banded" and params is None:
        params = band_params(n, m, k)
    if backend != "banded" or params is None:
        return xla_knn(query, points, k, approx=True)
    qt, wblk, nb = params
    if plan is None:
        plan = make_plan(query, points, params, extent, box)

    def one(q, p, b0, nv):
        return banded.banded_knn(q, p, k, query_tile=qt, wblk=wblk,
                                 n_blocks=nb, extent=extent, plan=(b0, nv))

    d, i = _vmapn(one, query.ndim - 2)(query, points, plan[0], plan[1])
    return jax.lax.stop_gradient(d), i


# ---------------------------------------------------------------------------
# fused knn + grouping — grads flow to feats only
# ---------------------------------------------------------------------------


def _bknn_group_impl(query, points, feats, plan, k, params, extent):
    qt, wblk, nb = params

    def one(q, p, ft, b0, nv):
        return banded.banded_knn_group(
            q, p, ft, k, query_tile=qt, wblk=wblk, n_blocks=nb,
            extent=extent, plan=(b0, nv))

    return _vmapn(one, query.ndim - 2)(query, points, feats, plan[0], plan[1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _bknn_group(query, points, feats, plan, k, params, extent):
    return _bknn_group_impl(query, points, feats, plan, k, params, extent)


def _bknn_group_fwd(query, points, feats, plan, k, params, extent):
    out = _bknn_group_impl(query, points, feats, plan, k, params, extent)
    _, idx, _ = out
    return out, (idx, query, points, feats)


def _bknn_group_bwd(k, params, extent, res, cts):
    idx, query, points, feats = res
    g_ct = cts[2]
    m = feats.shape[-2]

    def one(i, g):
        return jax.ops.segment_sum(
            g.reshape(-1, g.shape[-1]), i.reshape(-1), num_segments=m)

    gf = _vmapn(one, idx.ndim - 2)(idx, g_ct).astype(feats.dtype)
    zplan = jax.tree.map(jnp.zeros_like, (query, points))
    return (*zplan, gf, None)


_bknn_group.defvjp(_bknn_group_fwd, _bknn_group_bwd)


def nn_knn_group(
    query: Array, points: Array, feats: Array, k: int,
    backend: str = "xla", extent: float = 64.0,
    plan=None, params=None, box=None,
):
    """Fused kNN + grouping.

    Returns (idx [.., N, k], grouped [.., N, k, C], plan, params) — plan and
    params are non-None only on the banded path, for reuse by nn_regroup /
    nn_scatter_softmax_sum on the same (query, points) pair.
    """
    n, m = query.shape[-2], points.shape[-2]
    if backend == "banded" and params is None:
        params = band_params(n, m, k)
    if backend != "banded" or params is None:
        _, idx = xla_knn(query, points, k, approx=True)
        return idx, group_points(feats, idx), None, None
    if plan is None:
        plan = make_plan(query, points, params, extent, box)
    # plan is integer data; custom_vjp requires float-only diff args, so it
    # rides as a nondiff operand via the None cotangent
    _, idx, grouped = _bknn_group(
        jax.lax.stop_gradient(query), jax.lax.stop_gradient(points),
        feats, jax.lax.stop_gradient(plan), k, params, extent)
    return idx, grouped, plan, params


# ---------------------------------------------------------------------------
# DUAL fused knn + grouping (cost-volume twin calls) — grads to feats only
# ---------------------------------------------------------------------------


def _bknn_group2_impl(qa, qb, pa, pb, feats, plan, k, params, extent):
    qt, wblk, nb = params

    def one(a, b, ta, tb, ft, b0, nv):
        return banded.banded_knn_group2(
            a, b, ta, tb, ft, k, query_tile=qt, wblk=wblk, n_blocks=nb,
            extent=extent, plan=(b0, nv))

    return _vmapn(one, qa.ndim - 2)(qa, qb, pa, pb, feats, plan[0], plan[1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def _bknn_group2(qa, qb, pa, pb, feats, k, params, extent, plan):
    return _bknn_group2_impl(qa, qb, pa, pb, feats, plan, k, params, extent)


def _bknn_group2_fwd(qa, qb, pa, pb, feats, k, params, extent, plan):
    out = _bknn_group2_impl(qa, qb, pa, pb, feats, plan, k, params, extent)
    _, ia, _, _, ib, _ = out
    return out, (ia, ib, qa, qb, pa, pb, feats)


def _bknn_group2_bwd(k, params, extent, res, cts):
    ia, ib, qa, qb, pa, pb, feats = res
    g_a, g_b = cts[2], cts[5]
    m = feats.shape[-2]

    def one(i, g):
        return jax.ops.segment_sum(
            g.reshape(-1, g.shape[-1]), i.reshape(-1), num_segments=m)

    gf = (_vmapn(one, ia.ndim - 2)(ia, g_a)
          + _vmapn(one, ib.ndim - 2)(ib, g_b)).astype(feats.dtype)
    zeros = jax.tree.map(jnp.zeros_like, (qa, qb, pa, pb))
    return (*zeros, gf, None)


_bknn_group2.defvjp(_bknn_group2_fwd, _bknn_group2_bwd)


def nn_knn_group2(
    query_a: Array, query_b: Array, points_a: Array, points_b: Array,
    feats: Array, k: int,
    backend: str = "xla", extent: float = 64.0, box=None,
):
    """The cost volume's twin fused kNN+group calls in one band stream.

    Falls back to two independent ``nn_knn_group`` calls off the banded
    path. Returns (idx_a, grouped_a, idx_b, grouped_b, plan, params) — the
    SHARED plan serves downstream nn_regroup (on idx_a) and
    nn_scatter_softmax_sum (on idx_b).
    """
    n, m = query_a.shape[-2], points_a.shape[-2]
    params = band_params(n, m, k) if backend == "banded" else None
    if params is None:
        ia, ga, _, _ = nn_knn_group(query_a, points_a, feats, k,
                                    backend=backend, extent=extent, box=box)
        ib, gb, _, _ = nn_knn_group(query_b, points_b, feats, k,
                                    backend=backend, extent=extent, box=box)
        return ia, ga, ib, gb, None, None
    plan = make_plan(query_a, points_a, params, extent, box)
    _, ia, ga, _, ib, gb = _bknn_group2(
        jax.lax.stop_gradient(query_a), jax.lax.stop_gradient(query_b),
        jax.lax.stop_gradient(points_a), jax.lax.stop_gradient(points_b),
        feats, k, params, extent, jax.lax.stop_gradient(plan))
    return ia, ga, ib, gb, plan, params


# ---------------------------------------------------------------------------
# regroup (grouping by existing banded indices) — grads flow to feats
# ---------------------------------------------------------------------------


def _bregroup_impl(idx, feats, plan, params):
    qt, wblk, nb = params

    def one(i, ft, b0, nv):
        return banded.banded_regroup(i, ft, (b0, nv), query_tile=qt,
                                     wblk=wblk, n_blocks=nb)

    return _vmapn(one, idx.ndim - 2)(idx, feats, plan[0], plan[1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _bregroup(idx, feats, plan, params):
    return _bregroup_impl(idx, feats, plan, params)


def _bregroup_fwd(idx, feats, plan, params):
    return _bregroup_impl(idx, feats, plan, params), (idx, feats)


def _bregroup_bwd(params, res, g_ct):
    idx, feats = res
    m = feats.shape[-2]

    def one(i, g):
        return jax.ops.segment_sum(
            g.reshape(-1, g.shape[-1]), i.reshape(-1), num_segments=m)

    gf = _vmapn(one, idx.ndim - 2)(idx, g_ct).astype(feats.dtype)
    return (None, gf, None)


_bregroup.defvjp(_bregroup_fwd, _bregroup_bwd)


def nn_regroup(feats: Array, idx: Array, plan, params) -> Array:
    """Group feats [.., M, C] by idx [.., N, K] produced under ``plan``."""
    if params is None:
        return group_points(feats, idx)
    return _bregroup(idx, feats, jax.lax.stop_gradient(plan), params)


# ---------------------------------------------------------------------------
# fused knn + inverse-distance interpolation — grads flow to fields
# (weights constant, three_interpolate backward semantics)
# ---------------------------------------------------------------------------


def _bknn_idw_impl(query, points, fields, plan, k, params, extent):
    qt, wblk, nb = params

    def one(q, p, ft, b0, nv):
        return banded.banded_knn_idw(
            q, p, ft, k, query_tile=qt, wblk=wblk, n_blocks=nb,
            extent=extent, plan=(b0, nv))

    return _vmapn(one, query.ndim - 2)(query, points, fields, plan[0],
                                       plan[1])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _bknn_idw(query, points, fields, plan, k, params, extent):
    return _bknn_idw_impl(query, points, fields, plan, k, params, extent)[0]


def _bknn_idw_fwd(query, points, fields, plan, k, params, extent):
    out, d, idx = _bknn_idw_impl(query, points, fields, plan, k, params,
                                 extent)
    return out, (d, idx, query, points, fields)


def _bknn_idw_bwd(k, params, extent, res, g_ct):
    d, idx, query, points, fields = res
    m = fields.shape[-2]
    w = idw_weights(d)  # same formula as the kernel (eps=1e-2)
    vals = w[..., None] * g_ct.astype(jnp.float32)[..., None, :]

    def one(i, v):
        return jax.ops.segment_sum(
            v.reshape(-1, v.shape[-1]), i.reshape(-1), num_segments=m)

    gf = _vmapn(one, idx.ndim - 2)(idx, vals).astype(fields.dtype)
    zq, zp = jax.tree.map(jnp.zeros_like, (query, points))
    return (zq, zp, gf, None)


_bknn_idw.defvjp(_bknn_idw_fwd, _bknn_idw_bwd)


def nn_knn_idw(
    query: Array, points: Array, fields: Array, k: int,
    backend: str = "xla", extent: float = 64.0, box=None,
) -> Array:
    """out[.., i, :] = sum_j idw_w_j * fields[.., idx_j, :] (UpsampleFlow /
    PointWarping inner loop)."""
    n, m = query.shape[-2], points.shape[-2]
    params = band_params(n, m, k) if backend == "banded" else None
    if params is None:
        d, idx = xla_knn(query, points, k, approx=True)
        w = idw_weights(d)
        return jnp.sum(w[..., None] * group_points(fields, idx), axis=-2)
    plan = make_plan(query, points, params, extent, box)
    return _bknn_idw(
        jax.lax.stop_gradient(query), jax.lax.stop_gradient(points),
        fields, jax.lax.stop_gradient(plan), k, params, extent)


# ---------------------------------------------------------------------------
# scatter softmax-sum — fully differentiable (torch_scatter parity)
# ---------------------------------------------------------------------------


def _bscatter_impl(vals, w, idx, plan, n_out, params):
    qt, wblk, nb = params
    # global-max stabilization (shift-invariant per segment; see
    # models/costvolume.py::_segment_softmax_sum); the exp + numerator/
    # denominator augmentation happens inside the kernel, in VMEM
    w_shift = w - jax.lax.stop_gradient(jnp.max(w))

    def one(i, v, ws, b0, nv):
        return banded.banded_scatter_softmax_sum(
            i, v, ws, (b0, nv), n_out, query_tile=qt, wblk=wblk, n_blocks=nb)

    s = _vmapn(one, idx.ndim - 2)(idx, vals, w_shift, plan[0], plan[1])
    denom = jnp.maximum(s[..., -1:], 1e-16)
    out = s[..., :-1] / denom
    return out, denom


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _bscatter_softmax_sum(vals, w, idx, plan, n_out, params):
    return _bscatter_impl(vals, w, idx, plan, n_out, params)[0]


def _bscatter_fwd(vals, w, idx, plan, n_out, params):
    out, denom = _bscatter_impl(vals, w, idx, plan, n_out, params)
    ex = jnp.exp(w - jax.lax.stop_gradient(jnp.max(w)))
    soft = ex / group_points(denom, idx)[..., 0]  # denom rows at each idx
    return out, (soft, idx, vals, out)


def _bscatter_bwd(n_out, params, res, g_ct):
    soft, idx, vals, out = res
    g = g_ct.astype(jnp.float32)
    gm = group_points(g, idx)  # [.., N, K, C] cotangent rows at each idx
    om = group_points(out, idx)
    dvals = (soft[..., None] * gm).astype(vals.dtype)
    # dL/dw = soft * (<vals - out[m], g[m]>)  (softmax-within-segment rule)
    dw = soft * jnp.sum((vals.astype(jnp.float32) - om) * gm, axis=-1)
    return (dvals, dw.astype(soft.dtype), None, None)


_bscatter_softmax_sum.defvjp(_bscatter_fwd, _bscatter_bwd)


def nn_scatter_softmax_sum(
    vals: Array,  # [.., N, K, C]
    w: Array,  # [.., N, K] logits
    idx: Array,  # [.., N, K] output rows (banded: within plan's bands)
    n_out: int,
    plan=None, params=None,
) -> Array:
    """Per-segment softmax(w) applied to vals, summed per output row.

    Replaces scatter_softmax + scatter_sum (soflow.py:474-481). On the
    banded path the aggregation runs as transposed one-hot MXU matmuls with
    the output resident in VMEM (ops/banded.py::banded_scatter_add).
    """
    if params is None:
        from ssf_slam_tpu.models.costvolume import _segment_softmax_sum
        b = idx.shape[:-2]
        flat_v = vals.reshape(b + (-1, vals.shape[-1]))
        flat_w = w.reshape(b + (-1, 1))
        flat_i = idx.reshape(b + (-1,))

        def one(v, ww, i):
            return _segment_softmax_sum(v, ww, i, n_out)

        return _vmapn(one, idx.ndim - 2)(flat_v, flat_w, flat_i)
    return _bscatter_softmax_sum(vals, w, idx.astype(jnp.int32),
                                 jax.lax.stop_gradient(plan), n_out, params)
