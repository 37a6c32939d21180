"""Voxel-grid downsampling with static shapes.

TPU-native replacement for ``pcl::VoxelGrid`` (src/frameFeature.cpp:125-127,
src/mapOptmization.cpp:461-462). PCL emits a dynamically-sized cloud of voxel
centroids; XLA needs static shapes, so we keep the input's N and return a
*validity mask* selecting one representative per occupied voxel, with each
representative's position replaced by its voxel centroid. Downstream consumers
already operate on (points, mask) pairs, so the dynamic-size behavior of the
reference is reproduced without any dynamic shapes.

Implementation: integer voxel coordinates -> multiplicative hash into a fixed
table; one scatter-add pass accumulates per-voxel sums/counts/min-index; a
gather pass selects the min-index point of each voxel as representative. Hash
collisions (rare at table_size ~ 4N) merge voxels — strictly more
downsampling, never corruption.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _voxel_hash(coords: Array, table_size: int) -> Array:
    """[..., 3] int32 voxel coords -> [...] hash in [0, table_size)."""
    # large odd mixing constants (Teschner et al. spatial hashing)
    h = (
        coords[..., 0] * jnp.int32(73856093)
        ^ coords[..., 1] * jnp.int32(19349663)
        ^ coords[..., 2] * jnp.int32(83492791)
    )
    return jnp.abs(h) % table_size


@functools.partial(jax.jit, static_argnames=("table_mult",))
def voxel_downsample(
    points: Array,
    leaf: float | Array,
    mask: Array | None = None,
    table_mult: int = 4,
) -> tuple[Array, Array]:
    """Voxel-grid filter.

    Args:
      points: [N, 3].
      leaf: voxel edge length (e.g. 0.2 as frameFeature.cpp:153).
      mask: optional [N] bool validity of inputs.
      table_mult: hash table size multiplier (table = table_mult * N).

    Returns:
      (out_points [N, 3], out_mask [N]): out_mask selects one representative
      per occupied voxel; selected rows hold the voxel centroid.
    """
    n = points.shape[0]
    table_size = table_mult * n
    if mask is None:
        mask = jnp.ones((n,), dtype=bool)

    coords = jnp.floor(points / leaf).astype(jnp.int32)
    slot = _voxel_hash(coords, table_size)

    w = mask.astype(points.dtype)
    sums = jnp.zeros((table_size, 3), points.dtype).at[slot].add(points * w[:, None])
    cnts = jnp.zeros((table_size,), points.dtype).at[slot].add(w)
    idxs = jnp.arange(n, dtype=jnp.int32)
    min_idx = jnp.full((table_size,), n, dtype=jnp.int32).at[slot].min(
        jnp.where(mask, idxs, n)
    )

    is_rep = mask & (min_idx[slot] == idxs)
    centroid = sums[slot] / jnp.maximum(cnts[slot], 1.0)[:, None]
    out = jnp.where(is_rep[:, None], centroid, points)
    return out, is_rep
