"""Morton (Z-order) spatial sorting + windowed neighbor search.

The framework's O(N^2) brute-force kNN and random-access gathers are the
measured throughput ceiling of the scene-flow network (docs/PERFORMANCE.md).
This module provides the locality machinery that turns them into O(N*W)
banded operations:

- ``morton_codes``: 30-bit interleaved Z-order codes over a bounded extent;
- ``morton_argsort``: the permutation making spatially-near points
  index-near (typical kNN neighbors land within a few dozen sorted
  positions);
- ``knn_windowed``: kNN restricted to a +-W/2 band of sorted positions
  around each query's rank — a contiguous band gather + an [N, W] distance
  block instead of the full [N, M] matrix.

Quality contract: windowed kNN is approximate. Measured on 8192-pt
lidar-like clouds (k=16): first-neighbor recall 1.000 at every window;
k-set recall 0.83 / 0.88 / 0.92 at W = 64 / 128 / 256 — the escapees are
the farthest neighbors, whose contribution to max-pooled grouping layers is
weakest. Exact ops remain the default everywhere; this is the opt-in fast
path (integration tracked in docs/ROADMAP.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _expand_bits(v: Array) -> Array:
    """Spread the low 10 bits of v so there are 2 zero bits between each."""
    v = v & 0x3FF
    v = (v | (v << 16)) & jnp.uint32(0x30000FF)
    v = (v | (v << 8)) & jnp.uint32(0x300F00F)
    v = (v | (v << 4)) & jnp.uint32(0x30C30C3)
    v = (v | (v << 2)) & jnp.uint32(0x9249249)
    return v


def morton_codes(
    xyz: Array, extent: float = 64.0, origin: Array | None = None,
    scale: Array | None = None,
) -> Array:
    """[..., N, 3] -> [..., N] uint32 Z-order codes (10 bits per axis).

    The quantization box is [origin, origin + scale] (isotropic). Defaults
    reproduce the fixed [-extent, +extent] box; pass a per-cloud (origin,
    scale) — e.g. from ops/neighbors.py::cloud_box — for full 10-bit
    resolution on arbitrarily-placed scenes (clipped coords lose all
    locality, measured as a 0.91 -> 0.93 banded-recall gain on street
    clouds whose far corner exceeded the fixed box).
    """
    if origin is None:
        origin = -extent
    if scale is None:
        scale = 2 * extent
    q = jnp.clip((xyz - origin) / scale * 1024.0, 0.0, 1023.0)
    q = q.astype(jnp.uint32)
    return (
        _expand_bits(q[..., 0])
        | (_expand_bits(q[..., 1]) << 1)
        | (_expand_bits(q[..., 2]) << 2)
    )


def morton_argsort(xyz: Array, mask: Array | None = None,
                   extent: float = 64.0, origin: Array | None = None,
                   scale: Array | None = None) -> Array:
    """Permutation sorting points by Morton code (invalid points last)."""
    codes = morton_codes(xyz, extent, origin=origin, scale=scale)
    if mask is not None:
        codes = jnp.where(mask, codes, jnp.uint32(0xFFFFFFFF))
    return jnp.argsort(codes)


@functools.partial(jax.jit, static_argnames=("k", "window"))
def knn_windowed(
    query_sorted: Array,  # [N, 3] queries in Morton order
    points_sorted: Array,  # [M, 3] targets in Morton order
    k: int,
    window: int = 64,
    points_mask: Array | None = None,
    extent: float = 64.0,
) -> tuple[Array, Array]:
    """Approximate kNN over a +-window/2 band of Morton ranks.

    Returns (sqdist [N, k], idx [N, k] into points_sorted). Both inputs must
    already be Morton-sorted (``morton_argsort``); returned indices refer to
    the sorted order.
    """
    n, m = query_sorted.shape[0], points_sorted.shape[0]
    w = min(window, m)
    qcodes = morton_codes(query_sorted, extent)
    pcodes = morton_codes(points_sorted, extent)
    # match morton_argsort's masked-point sentinel: with a points_mask the
    # masked rows were sorted by 0xFFFFFFFF, so the recomputed codes must use
    # the same sentinel or the array is no longer sorted and searchsorted's
    # binary search returns wrong band centers
    if points_mask is not None:
        pcodes = jnp.where(points_mask, pcodes, jnp.uint32(0xFFFFFFFF))
    center = jnp.searchsorted(pcodes, qcodes)  # [N] band centers
    start = jnp.clip(center - w // 2, 0, m - w)

    # contiguous band gather: rows start_i .. start_i + w
    band_idx = start[:, None] + jnp.arange(w)[None, :]  # [N, W]
    band = points_sorted[band_idx]  # [N, W, 3]
    d = jnp.sum((band - query_sorted[:, None, :]) ** 2, axis=-1)
    if points_mask is not None:
        valid = points_mask[band_idx]
        d = jnp.where(valid, d, 1e10)
    neg_d, pos = jax.lax.top_k(-d, k)
    return -neg_d, jnp.take_along_axis(band_idx, pos, axis=-1)
