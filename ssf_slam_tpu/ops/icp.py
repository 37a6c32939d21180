"""Masked point-to-point ICP.

TPU-native replacement for ``pcl::IterativeClosestPoint`` used in loop-closure
registration (src/mapOptmization.cpp:240-251): fixed-iteration NN + Kabsch
with a max-correspondence-distance gate, returning the final transform and
PCL-style fitness score (mean squared distance of in-range correspondences).
The reference budget is 100 PCL iterations; SVD-based ICP converges in far
fewer, and the iteration count is config (MappingConfig.icp_iters).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ssf_slam_tpu.ops.kabsch import kabsch
from ssf_slam_tpu.ops.knn import nearest_neighbor
from ssf_slam_tpu.ops.precision import GEOM

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("iters",))
def icp_point_to_point(
    source: Array,
    target: Array,
    source_mask: Array,
    target_mask: Array,
    max_corr_dist: float = 50.0,
    iters: int = 30,
    init_r: Array | None = None,
    init_t: Array | None = None,
) -> tuple[Array, Array, Array]:
    """Align source onto target.

    Returns (R [3,3], t [3], fitness) with aligned = source @ R.T + t;
    fitness is the mean squared NN distance of in-range correspondences after
    convergence (pcl::Registration::getFitnessScore semantics).
    init_r/init_t warm-start the transform (identity by default).
    """
    max2 = max_corr_dist * max_corr_dist

    def body(_, carry):
        r, t = carry
        moved = jnp.einsum("nc,dc->nd", source, r, precision=GEOM) + t
        d2, idx = nearest_neighbor(moved, target, points_mask=target_mask,
                                   approx=True)
        w = (source_mask & (d2 < max2)).astype(source.dtype)
        r_new, t_new = kabsch(moved, target[idx], w)
        # compose: total = new ∘ current
        r = jnp.einsum("ab,bc->ac", r_new, r, precision=GEOM)
        t = jnp.einsum("ab,b->a", r_new, t, precision=GEOM) + t_new
        return r, t

    r0 = jnp.eye(3, dtype=source.dtype) if init_r is None else init_r
    t0 = jnp.zeros(3, dtype=source.dtype) if init_t is None else init_t
    r, t = jax.lax.fori_loop(0, iters, body, (r0, t0))

    moved = jnp.einsum("nc,dc->nd", source, r, precision=GEOM) + t
    d2, _ = nearest_neighbor(moved, target, points_mask=target_mask,
                             approx=True)
    w = (source_mask & (d2 < max2)).astype(source.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    fitness = jnp.sum(d2 * w) / n
    return r, t, fitness
