"""Morton-banded neighborhood engine — Pallas TPU kernels.

TPU-native replacement for the pointnet2 CUDA kNN/grouping stack
(utils/utils.py:226-233, utils/soflow.py:384-418) on the NEURAL path. The
pure-XLA kNN (ops/knn.py) materializes an [N, M] distance matrix in HBM and
pays ~1.9 ms per 8192-point call in approx_max_k selection (measured,
scripts/microbench.py); with ~10 such calls per TFlow forward the selection
stack dominates the whole network.

This module exploits spatial locality instead: both clouds are sorted by
Morton code once (ops/morton.py), so each query's true neighbors live in a
narrow BAND of the sorted target array. A Pallas kernel then processes one
tile of TQ consecutive queries per grid step, streams in the 3 target blocks
around the tile's band center (block choice via scalar-prefetched indices —
pipelined HBM->VMEM by pallas), computes exact subtractive distances in VMEM
(no [N, M] HBM matrix, no MXU-expansion cancellation), and extracts a running
top-k with K iterative min passes. Grouping fuses into the same kernel as a
one-hot einsum on the MXU — replacing the ~1 ms HBM gather per call with a
~0.1 ms matmul.

Approximation contract: neighbors outside the 3-block band are missed.
Measured on lidar clouds (tests/test_banded.py) recall is higher than the
approx_max_k path used in round 1 for the same layers; the geometry /
registration path keeps the exact kNN.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ssf_slam_tpu.ops.morton import morton_codes

Array = jax.Array

_BIG = 1e10


# ---------------------------------------------------------------------------
# host-side band planning
# ---------------------------------------------------------------------------


def plan_bands(query, points, points_mask, query_tile, wblk, n_blocks,
               extent, box=None):
    """Shared host-side setup: band block indices + valid-count scalar.

    Band placement only needs BLOCK-granular ranks, so instead of ranking
    every query against every target (a full searchsorted — measured 1.6 ms
    at 8192x8192) we take one representative query per tile (the middle
    element: tiles are Morton-contiguous, so it is the spatial median) and
    rank it against the n_blocks_total BLOCK-BOUNDARY codes — an
    [n_tiles x n_blocks_total] comparison, microseconds.

    Returns (b0 [n_tiles] int32 first-block index, n_valid [1] int32). The
    plan is reusable by every kernel in this module that shares the same
    (query, points) pair — banded_knn* produce indices guaranteed to lie in
    [b0*wblk, (b0+n_blocks)*wblk), which banded_regroup / banded_scatter_add
    exploit.
    """
    m = points.shape[0]
    assert m % wblk == 0, f"target count {m} not a multiple of wblk={wblk}"
    assert query.shape[0] % query_tile == 0
    origin, scale = box if box is not None else (None, None)
    qmid = query[query_tile // 2::query_tile]  # [n_tiles, 3]
    qc = morton_codes(qmid, extent, origin=origin, scale=scale)
    bc = morton_codes(points[::wblk], extent, origin=origin,
                      scale=scale)  # block-boundary codes
    if points_mask is not None:
        bc = jnp.where(points_mask[::wblk], bc, jnp.uint32(0xFFFFFFFF))
        n_valid = jnp.sum(points_mask.astype(jnp.int32))
    else:
        n_valid = jnp.int32(m)
    n_tiles_tgt = m // wblk
    # block containing each tile-center code: #boundaries <= code, minus 1
    contains = jnp.sum(
        (bc[None, :] <= qc[:, None]).astype(jnp.int32), axis=1
    ) - 1
    b0 = contains - (n_blocks // 2)
    b0 = jnp.clip(b0, 0, max(n_tiles_tgt - n_blocks, 0)).astype(jnp.int32)
    return b0, jnp.asarray([n_valid], jnp.int32)


def _band_specs(wblk: int, n_blocks: int, width: int):
    """n_blocks BlockSpecs reading consecutive wblk-row blocks of a target
    array, starting at the scalar-prefetched per-tile block index."""

    def mk(j):
        return pl.BlockSpec(
            (wblk, width),
            lambda i, b0, nv, j=j: (b0[i] + j, 0),
            memory_space=pltpu.VMEM,
        )

    return [mk(j) for j in range(n_blocks)]


# packed representation: distance f32 (>= 0, so its int32 bitcast preserves
# ordering) with the low 10 mantissa bits replaced by the band position.
# One int min then extracts (distance, argmin) in a single reduction; the
# distance loses 10 of 23 mantissa bits (< 0.013% relative) — far below
# sensor noise and the idw eps.
_POS_BITS = 10
_POS_MASK = (1 << _POS_BITS) - 1
_PACK_INF = 0x7F000000  # python int: jnp constants would be captured consts


def _topk_band(d, base, n_valid, k, wb):
    """K iterative min-extractions over a [TQ, WB] distance tile.

    Returns (dists [TQ, K] ascending, ABSOLUTE indices [TQ, K]). Ties break
    to the lowest band position. Slots beyond the number of valid candidates
    repeat the nearest index with distance >= _BIG (ops/knn.py contract).

    Cost shape: the band is pre-folded lane-block by lane-block with
    elementwise mins, so each extraction is ~1 reduction over 128 lanes plus
    a handful of [TQ, 128] elementwise passes — not k full passes over
    [TQ, WB] (measured 2x faster than the argmin-trick formulation).
    """
    assert wb <= (1 << _POS_BITS), "band wider than position field"
    tq = d.shape[0]
    iota = jax.lax.broadcasted_iota(jnp.int32, (tq, wb), 1)
    cols = iota + base
    d = jnp.where(cols < n_valid, d, _BIG)
    packed = (jax.lax.bitcast_convert_type(d, jnp.int32)
              & ~_POS_MASK) | iota
    n_fold = wb // 128
    folds = [packed[:, j * 128:(j + 1) * 128] for j in range(n_fold)]
    s = folds[0]
    for f in folds[1:]:
        s = jnp.minimum(s, f)
    ds, inds = [], []
    for _ in range(k):
        mn = jnp.min(s, axis=1, keepdims=True)  # [TQ, 1] packed
        ds.append(mn)
        inds.append(mn & _POS_MASK)
        new = []
        s = None
        for f in folds:
            f = jnp.where(f == mn, _PACK_INF, f)  # unique iota -> one winner
            new.append(f)
            s = f if s is None else jnp.minimum(s, f)
        folds = new
    pk = jnp.concatenate(ds, axis=1)  # [TQ, K] packed
    ik = jnp.concatenate(inds, axis=1)
    dk = jax.lax.bitcast_convert_type(pk & ~_POS_MASK,
                                      jnp.float32)
    # repeat the nearest valid index in overflow slots (distance stays big)
    ik = jnp.where(dk >= _BIG * 0.5, ik[:, :1], ik)
    return dk, ik + base


def _pairwise_band_dist(q, t):
    """Exact subtractive squared distances [TQ, WB] — per-coordinate
    broadcast subtraction, no |x|^2-2xy+|y|^2 cancellation."""
    d = jnp.zeros((q.shape[0], t.shape[0]), jnp.float32)
    for c in range(3):
        diff = q[:, c:c + 1] - t[:, c][None, :]
        d = d + diff * diff
    return d


# ---------------------------------------------------------------------------
# kernels
# ---------------------------------------------------------------------------


def _knn_kernel_body(k, wblk, n_blocks):
    wb = wblk * n_blocks

    def kernel(b0_ref, nv_ref, q_ref, *rest):
        t_refs = rest[:n_blocks]
        d_ref, i_ref = rest[n_blocks], rest[n_blocks + 1]
        i = pl.program_id(0)
        base = b0_ref[i] * wblk
        t = jnp.concatenate([r[:] for r in t_refs], axis=0)  # [WB, 3]
        d = _pairwise_band_dist(q_ref[:].astype(jnp.float32),
                                t.astype(jnp.float32))
        dk, ik = _topk_band(d, base, nv_ref[0], k, wb)
        d_ref[:] = dk
        i_ref[:] = ik

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("k", "query_tile", "wblk", "n_blocks", "extent",
                     "interpret"),
)
def banded_knn(
    query: Array,  # [N, 3] (Morton-ordered or near-ordered)
    points: Array,  # [M, 3] MORTON-SORTED (invalid rows last)
    k: int,
    points_mask: Array | None = None,
    query_tile: int = 256,
    wblk: int = 256,
    n_blocks: int = 3,
    extent: float = 64.0,
    interpret: bool = False,
    plan: tuple[Array, Array] | None = None,
) -> tuple[Array, Array]:
    """Banded approximate kNN. Returns (sqdist [N, k], idx [N, k] into the
    SORTED target order), ascending by distance."""
    n = query.shape[0]
    b0, nv = plan if plan is not None else plan_bands(
        query, points, points_mask, query_tile, wblk, n_blocks, extent)
    n_tiles = n // query_tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((query_tile, 3), lambda i, b0, nv: (i, 0),
                         memory_space=pltpu.VMEM),
            *_band_specs(wblk, n_blocks, 3),
        ],
        out_specs=[
            pl.BlockSpec((query_tile, k), lambda i, b0, nv: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, k), lambda i, b0, nv: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    d, idx = pl.pallas_call(
        _knn_kernel_body(k, wblk, n_blocks),
        out_shape=[
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(b0, nv, query, *([points] * n_blocks))
    return d, idx


def _knn_group_kernel_body(k, wblk, n_blocks, feat_dim, out_dtype):
    wb = wblk * n_blocks

    def kernel(b0_ref, nv_ref, q_ref, *rest):
        t_refs = rest[:n_blocks]
        f_refs = rest[n_blocks:2 * n_blocks]
        d_ref, i_ref, g_ref = rest[2 * n_blocks:]
        i = pl.program_id(0)
        base = b0_ref[i] * wblk
        t = jnp.concatenate([r[:] for r in t_refs], axis=0)  # [WB, 3]
        d = _pairwise_band_dist(q_ref[:].astype(jnp.float32),
                                t.astype(jnp.float32))
        dk, ik = _topk_band(d, base, nv_ref[0], k, wb)
        d_ref[:] = dk
        i_ref[:] = ik
        # grouping as one-hot MXU matmuls: each (query, slot) selects one
        # band row of the feature block — exact copy semantics (a 0/1 matrix
        # times features), ~10x cheaper than an HBM gather. One [TQ, WB] x
        # [WB, C] matmul per slot (Mosaic rejects the [TQ*K, WB] reshape).
        feats = jnp.concatenate([r[:] for r in f_refs], axis=0)  # [WB, C]
        tq = dk.shape[0]
        rel = ik - base  # [TQ, K] band positions
        band_iota = jax.lax.broadcasted_iota(jnp.int32, (tq, wb), 1)
        for j in range(k):
            onehot = (band_iota == rel[:, j:j + 1]).astype(feats.dtype)
            gj = jax.lax.dot_general(
                onehot, feats,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            # leading-dim slot write: [K, TQ, C] layout keeps the store a
            # plain 2D block (Mosaic rejects the (TQ,C)->(TQ,1,C) shape cast
            # a middle-dim write would need, at least for bf16)
            g_ref[j] = gj.astype(out_dtype)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("k", "query_tile", "wblk", "n_blocks", "extent",
                     "interpret"),
)
def banded_knn_group(
    query: Array,  # [N, 3]
    points: Array,  # [M, 3] Morton-sorted
    feats: Array,  # [M, C] co-sorted values to group
    k: int,
    points_mask: Array | None = None,
    query_tile: int = 256,
    wblk: int = 256,
    n_blocks: int = 3,
    extent: float = 64.0,
    interpret: bool = False,
    plan: tuple[Array, Array] | None = None,
) -> tuple[Array, Array, Array]:
    """Fused banded kNN + neighborhood grouping.

    Returns (sqdist [N, k], idx [N, k], grouped [N, k, C]) where
    ``grouped[i, j] = feats[idx[i, j]]``.
    """
    n = query.shape[0]
    c = feats.shape[-1]
    b0, nv = plan if plan is not None else plan_bands(
        query, points, points_mask, query_tile, wblk, n_blocks, extent)
    n_tiles = n // query_tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((query_tile, 3), lambda i, b0, nv: (i, 0),
                         memory_space=pltpu.VMEM),
            *_band_specs(wblk, n_blocks, 3),
            *_band_specs(wblk, n_blocks, c),
        ],
        out_specs=[
            pl.BlockSpec((query_tile, k), lambda i, b0, nv: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, k), lambda i, b0, nv: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, query_tile, c), lambda i, b0, nv: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    d, idx, grouped = pl.pallas_call(
        _knn_group_kernel_body(k, wblk, n_blocks, c, feats.dtype),
        out_shape=[
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.int32),
            jax.ShapeDtypeStruct((k, n, c), feats.dtype),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(b0, nv, query, *([points] * n_blocks), *([feats] * n_blocks))
    return d, idx, jnp.swapaxes(grouped, 0, 1)


def _knn_group2_kernel_body(k, wblk, n_blocks, feat_dim, out_dtype):
    wb = wblk * n_blocks

    def kernel(b0_ref, nv_ref, qa_ref, qb_ref, *rest):
        ta_refs = rest[:n_blocks]
        tb_refs = rest[n_blocks:2 * n_blocks]
        f_refs = rest[2 * n_blocks:3 * n_blocks]
        da_ref, ia_ref, ga_ref, db_ref, ib_ref, gb_ref = rest[3 * n_blocks:]
        i = pl.program_id(0)
        base = b0_ref[i] * wblk
        feats = jnp.concatenate([r[:] for r in f_refs], axis=0)  # [WB, C]
        band_iota = None

        def one(q_ref, t_refs, d_ref, i_ref, g_ref, band_iota):
            t = jnp.concatenate([r[:] for r in t_refs], axis=0)
            d = _pairwise_band_dist(q_ref[:].astype(jnp.float32),
                                    t.astype(jnp.float32))
            dk, ik = _topk_band(d, base, nv_ref[0], k, wb)
            d_ref[:] = dk
            i_ref[:] = ik
            tq = dk.shape[0]
            rel = ik - base
            if band_iota is None:
                band_iota = jax.lax.broadcasted_iota(jnp.int32, (tq, wb), 1)
            for j in range(k):
                onehot = (band_iota == rel[:, j:j + 1]).astype(feats.dtype)
                gj = jax.lax.dot_general(
                    onehot, feats,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                g_ref[j] = gj.astype(out_dtype)
            return band_iota

        band_iota = one(qa_ref, ta_refs, da_ref, ia_ref, ga_ref, band_iota)
        one(qb_ref, tb_refs, db_ref, ib_ref, gb_ref, band_iota)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("k", "query_tile", "wblk", "n_blocks", "extent",
                     "interpret"),
)
def banded_knn_group2(
    query_a: Array,  # [N, 3]
    query_b: Array,  # [N, 3] (near query_a — shares its band plan)
    points_a: Array,  # [M, 3] Morton-sorted
    points_b: Array,  # [M, 3] row-aligned with points_a (e.g. warped)
    feats: Array,  # [M, C] shared values to group for BOTH queries
    k: int,
    query_tile: int = 256,
    wblk: int = 256,
    n_blocks: int = 3,
    extent: float = 64.0,
    interpret: bool = False,
    plan: tuple[Array, Array] | None = None,
) -> tuple:
    """DUAL fused banded kNN+group: the cost volume's twin neighbor calls
    (soflow.py:384-391 and :406 stream the SAME xyz2-features payload) in
    one kernel — the feature band blocks are fetched from HBM once instead
    of twice, and both top-k selections share the tile loop.

    Both searches run inside ONE band plan (computed from ``query_a`` /
    ``points_a`` unless given): correct whenever query_b stays within the
    plan's block slack of query_a (they differ by the coarse flow, which is
    small vs the band width — the same contract point_warping relies on).
    Returns (d_a, i_a, grouped_a, d_b, i_b, grouped_b).
    """
    n = query_a.shape[0]
    c = feats.shape[-1]
    b0, nv = plan if plan is not None else plan_bands(
        query_a, points_a, None, query_tile, wblk, n_blocks, extent)
    n_tiles = n // query_tile
    qspec = pl.BlockSpec((query_tile, 3), lambda i, b0, nv: (i, 0),
                         memory_space=pltpu.VMEM)
    kspec = pl.BlockSpec((query_tile, k), lambda i, b0, nv: (i, 0),
                         memory_space=pltpu.VMEM)
    gspec = pl.BlockSpec((k, query_tile, c), lambda i, b0, nv: (0, i, 0),
                         memory_space=pltpu.VMEM)
    # out order: d_a, i_a, g_a, d_b, i_b, g_b
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            qspec, qspec,
            *_band_specs(wblk, n_blocks, 3),
            *_band_specs(wblk, n_blocks, 3),
            *_band_specs(wblk, n_blocks, c),
        ],
        out_specs=[kspec, kspec, gspec, kspec, kspec, gspec],
    )
    da, ia, ga, db, ib, gb = pl.pallas_call(
        _knn_group2_kernel_body(k, wblk, n_blocks, c, feats.dtype),
        out_shape=[
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.int32),
            jax.ShapeDtypeStruct((k, n, c), feats.dtype),
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.int32),
            jax.ShapeDtypeStruct((k, n, c), feats.dtype),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(b0, nv, query_a, query_b, *([points_a] * n_blocks),
      *([points_b] * n_blocks), *([feats] * n_blocks))
    return (da, ia, jnp.swapaxes(ga, 0, 1),
            db, ib, jnp.swapaxes(gb, 0, 1))


def _knn_idw_kernel_body(k, wblk, n_blocks, feat_dim, out_dtype, eps):
    wb = wblk * n_blocks

    def kernel(b0_ref, nv_ref, q_ref, *rest):
        t_refs = rest[:n_blocks]
        f_refs = rest[n_blocks:2 * n_blocks]
        o_ref, d_ref, i_ref = rest[2 * n_blocks:]
        i = pl.program_id(0)
        base = b0_ref[i] * wblk
        t = jnp.concatenate([r[:] for r in t_refs], axis=0)
        d = _pairwise_band_dist(q_ref[:].astype(jnp.float32),
                                t.astype(jnp.float32))
        dk, ik = _topk_band(d, base, nv_ref[0], k, wb)
        # inverse-distance weights — exact ops/interp.py::idw_weights
        # semantics: 1/sqrt(sqdist + eps^2), normalized (eps = 1 cm keeps
        # gradients finite when a query coincides with a target)
        w = 1.0 / jnp.sqrt(jnp.maximum(dk, 0.0) + eps * eps)
        w = w / jnp.sum(w, axis=1, keepdims=True)  # [TQ, K]
        # scatter the K weights into band positions -> [TQ, WB] mixing
        # matrix, then one MXU matmul against the feature band
        tq = dk.shape[0]
        band_iota = jax.lax.broadcasted_iota(jnp.int32, (tq, wb), 1)
        rel = ik - base
        wmat = jnp.zeros((tq, wb), jnp.float32)
        for j in range(k):
            wmat = wmat + jnp.where(
                band_iota == rel[:, j:j + 1], w[:, j:j + 1], 0.0
            )
        feats = jnp.concatenate([r[:] for r in f_refs], axis=0)
        out = jax.lax.dot_general(
            wmat, feats.astype(jnp.float32),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:] = out.astype(out_dtype)
        d_ref[:] = dk
        i_ref[:] = ik

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("k", "query_tile", "wblk", "n_blocks", "extent",
                     "interpret", "eps"),
)
def banded_knn_idw(
    query: Array,  # [N, 3]
    points: Array,  # [M, 3] Morton-sorted
    feats: Array,  # [M, C]
    k: int,
    points_mask: Array | None = None,
    query_tile: int = 256,
    wblk: int = 256,
    n_blocks: int = 3,
    extent: float = 64.0,
    eps: float = 1e-2,
    interpret: bool = False,
    plan: tuple[Array, Array] | None = None,
) -> tuple[Array, Array, Array]:
    """Fused banded kNN + inverse-distance-weighted interpolation.

    Returns (out [N, C], sqdist [N, k], idx [N, k]): out = sum_j
    idw_weight_j * feats[idx_j] — the upsample_flow / point_warping inner
    loop (soflow.py:1442-1475,1222-1257) in one kernel with no materialized
    neighbor tensors. The (sqdist, idx) pair feeds the custom-VJP residuals
    (ops/neighbors.py) and costs only two tiny extra output writes.
    """
    n = query.shape[0]
    c = feats.shape[-1]
    b0, nv = plan if plan is not None else plan_bands(
        query, points, points_mask, query_tile, wblk, n_blocks, extent)
    n_tiles = n // query_tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((query_tile, 3), lambda i, b0, nv: (i, 0),
                         memory_space=pltpu.VMEM),
            *_band_specs(wblk, n_blocks, 3),
            *_band_specs(wblk, n_blocks, c),
        ],
        out_specs=[
            pl.BlockSpec((query_tile, c), lambda i, b0, nv: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, k), lambda i, b0, nv: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, k), lambda i, b0, nv: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
    )
    out, d, idx = pl.pallas_call(
        _knn_idw_kernel_body(k, wblk, n_blocks, c, feats.dtype, eps),
        out_shape=[
            jax.ShapeDtypeStruct((n, c), feats.dtype),
            jax.ShapeDtypeStruct((n, k), jnp.float32),
            jax.ShapeDtypeStruct((n, k), jnp.int32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
    )(b0, nv, query, *([points] * n_blocks), *([feats] * n_blocks))
    return out, d, idx


def _regroup_kernel_body(k, wblk, n_blocks, feat_dim, out_dtype):
    wb = wblk * n_blocks

    def kernel(b0_ref, nv_ref, i_ref, *rest):
        f_refs = rest[:n_blocks]
        g_ref = rest[n_blocks]
        i = pl.program_id(0)
        base = b0_ref[i] * wblk
        feats = jnp.concatenate([r[:] for r in f_refs], axis=0)  # [WB, C]
        ik = i_ref[:]  # [TQ, K] absolute indices, guaranteed inside the band
        tq = ik.shape[0]
        rel = ik - base
        band_iota = jax.lax.broadcasted_iota(jnp.int32, (tq, wb), 1)
        for j in range(k):
            onehot = (band_iota == rel[:, j:j + 1]).astype(feats.dtype)
            gj = jax.lax.dot_general(
                onehot, feats,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            g_ref[j] = gj.astype(out_dtype)  # leading-dim slot write

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("query_tile", "wblk", "n_blocks", "interpret"),
)
def banded_regroup(
    idx: Array,  # [N, K] absolute indices into the sorted target order
    feats: Array,  # [M, C] co-sorted values to group
    plan: tuple[Array, Array],  # (b0, n_valid) from plan_bands — the SAME
    # plan that produced idx (band containment is the correctness contract)
    query_tile: int = 256,
    wblk: int = 256,
    n_blocks: int = 3,
    interpret: bool = False,
) -> Array:
    """Grouping-only kernel: ``out[i, j] = feats[idx[i, j]]``.

    Requires every idx[i, :] to lie inside query-tile i's band
    [b0*wblk, (b0+n_blocks)*wblk) — true by construction for indices produced
    by banded_knn/banded_knn_group under the same plan. Out-of-band indices
    return zeros (the one-hot has no matching column), never garbage.
    """
    n, k = idx.shape
    c = feats.shape[-1]
    b0, nv = plan
    n_tiles = n // query_tile
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((query_tile, k), lambda i, b0, nv: (i, 0),
                         memory_space=pltpu.VMEM),
            *_band_specs(wblk, n_blocks, c),
        ],
        out_specs=pl.BlockSpec((k, query_tile, c), lambda i, b0, nv: (0, i, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        _regroup_kernel_body(k, wblk, n_blocks, c, feats.dtype),
        out_shape=jax.ShapeDtypeStruct((k, n, c), feats.dtype),
        grid_spec=grid_spec,
        interpret=interpret,
    )(b0, nv, idx, *([feats] * n_blocks))
    return jnp.swapaxes(out, 0, 1)


def _scatter_add_kernel_body(k, wblk, n_blocks, feat_dim, mm_dtype,
                             with_softmax_aug: bool):
    wb = wblk * n_blocks

    def kernel(b0_ref, i_ref, v_ref, *rest):
        if with_softmax_aug:
            w_ref, o_ref = rest
        else:
            (o_ref,) = rest
        i = pl.program_id(0)

        @pl.when(i == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        base = b0_ref[i] * wblk
        ik = i_ref[:]  # [TQ, K]
        tq = ik.shape[0]
        rel = ik - base
        band_iota = jax.lax.broadcasted_iota(jnp.int32, (tq, wb), 1)
        if with_softmax_aug:
            ex = jnp.exp(w_ref[:])  # [TQ, K] pre-shifted logits
        contrib = jnp.zeros(
            (wb, feat_dim + (1 if with_softmax_aug else 0)), jnp.float32)
        for j in range(k):
            # transposed one-hot: out rows are band positions, so the matmul
            # contracts over the query tile — an MXU scatter
            onehot = (band_iota == rel[:, j:j + 1]).astype(mm_dtype)
            vj = v_ref[j].astype(jnp.float32)  # leading-dim slot read
            if with_softmax_aug:
                # augmented value rows [vals * e^w, e^w] built in VMEM —
                # the softmax numerator and denominator scatter in ONE
                # matmul, with no [N, K, C+1] HBM materialization
                e = ex[:, j:j + 1]
                vj = jnp.concatenate([vj * e, e], axis=-1)
            contrib = contrib + jax.lax.dot_general(
                onehot, vj.astype(mm_dtype),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        o_ref[pl.ds(base, wb), :] += contrib

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_out", "query_tile", "wblk", "n_blocks", "interpret"),
)
def banded_scatter_add(
    idx: Array,  # [N, K] absolute indices into the output rows
    vals: Array,  # [N, K, C] values to accumulate
    plan: tuple[Array, Array],  # the plan that produced idx
    n_out: int,
    query_tile: int = 256,
    wblk: int = 256,
    n_blocks: int = 3,
    interpret: bool = False,
) -> Array:
    """Banded segment-sum: ``out[m] = sum_{i,j: idx[i,j]==m} vals[i,j]``.

    The TPU-native replacement for the torch_scatter backward-cost
    aggregation (soflow.py:471-484): the output lives resident in VMEM across
    the whole grid while each query tile adds its band contribution as a
    transposed one-hot MXU matmul — no HBM scatter traffic at all. Same
    band-containment contract as banded_regroup. Output is float32.
    """
    n, k = idx.shape
    c = vals.shape[-1]
    b0, _ = plan
    n_tiles = n // query_tile
    # bf16 one-hot matmuls are exact for value copies (1.0 * v = v) but the
    # CONTRACTION accumulates in f32 via preferred_element_type; use the
    # value dtype for the multiplicands to halve VMEM pressure
    mm_dtype = vals.dtype if vals.dtype == jnp.bfloat16 else jnp.float32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((query_tile, k), lambda i, b0: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, query_tile, c), lambda i, b0: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_out, c), lambda i, b0: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _scatter_add_kernel_body(k, wblk, n_blocks, c, mm_dtype, False),
        out_shape=jax.ShapeDtypeStruct((n_out, c), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(b0, idx, jnp.swapaxes(vals, 0, 1))


@functools.partial(
    jax.jit,
    static_argnames=("n_out", "query_tile", "wblk", "n_blocks", "interpret"),
)
def banded_scatter_softmax_sum(
    idx: Array,  # [N, K] absolute indices into the output rows
    vals: Array,  # [N, K, C] values
    w_shift: Array,  # [N, K] f32 softmax logits, ALREADY max-shifted
    plan: tuple[Array, Array],  # the plan that produced idx
    n_out: int,
    query_tile: int = 256,
    wblk: int = 256,
    n_blocks: int = 3,
    interpret: bool = False,
) -> Array:
    """Fused banded scatter of [vals * e^w, e^w] -> f32 [n_out, C+1].

    The numerator/denominator pair of the segment softmax-sum
    (soflow.py:471-484) in one kernel: the exp and the augmented value rows
    are built per-tile in VMEM instead of materializing a [N, K, C+1]
    concatenation in HBM. Caller divides by the last column.
    """
    n, k = idx.shape
    c = vals.shape[-1]
    b0, _ = plan
    n_tiles = n // query_tile
    mm_dtype = vals.dtype if vals.dtype == jnp.bfloat16 else jnp.float32
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((query_tile, k), lambda i, b0: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((k, query_tile, c), lambda i, b0: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((query_tile, k), lambda i, b0: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_out, c + 1), lambda i, b0: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _scatter_add_kernel_body(k, wblk, n_blocks, c, mm_dtype, True),
        out_shape=jax.ShapeDtypeStruct((n_out, c + 1), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(b0, idx, jnp.swapaxes(vals, 0, 1), w_shift.astype(jnp.float32))
