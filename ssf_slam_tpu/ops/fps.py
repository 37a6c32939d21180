"""Farthest point sampling.

TPU-native replacement for the pointnet2 CUDA ``furthest_point_sample``
(utils/utils.py:226). The algorithm is inherently sequential in the sample
index, but each iteration is a fully-vectorized distance update + argmax over
all N points, which maps cleanly onto the VPU inside a ``lax.fori_loop``.

Matches the CUDA op's semantics: starts from index 0, iteratively picks the
point with the maximum min-distance to the selected set. Padded (invalid)
points are excluded by forcing their running distance to -inf.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample(
    xyz: Array, npoint: int, mask: Array | None = None
) -> Array:
    """FPS indices.

    Args:
      xyz: [..., N, 3] points.
      npoint: number of samples (static).
      mask: optional [..., N] bool validity; invalid points are never sampled
        (if fewer than npoint valid points exist, indices repeat).

    Returns:
      [..., npoint] int32 indices into N.
    """
    batch_shape = xyz.shape[:-2]
    n = xyz.shape[-2]
    flat = xyz.reshape((-1, n, 3))
    flat_mask = None if mask is None else mask.reshape((-1, n))

    def one(args):
        pts, m = args
        # running min-distance to the selected set
        dist = jnp.full((n,), jnp.inf, dtype=jnp.float32)
        if m is not None:
            neg = jnp.where(m, 0.0, -jnp.inf)
        else:
            neg = jnp.zeros((n,), dtype=jnp.float32)

        def body(i, carry):
            dist, idxs, last = carry
            d = jnp.sum((pts - pts[last]) ** 2, axis=-1)
            dist = jnp.minimum(dist, d)
            nxt = jnp.argmax(dist + neg).astype(jnp.int32)
            idxs = idxs.at[i].set(nxt)
            return dist, idxs, nxt

        first = (
            jnp.argmax(neg == 0.0).astype(jnp.int32)
            if m is not None
            else jnp.int32(0)
        )
        idxs0 = jnp.zeros((npoint,), dtype=jnp.int32).at[0].set(first)
        _, idxs, _ = jax.lax.fori_loop(1, npoint, body, (dist, idxs0, first))
        return idxs

    if flat_mask is None:
        out = jax.vmap(lambda p: one((p, None)))(flat)
    else:
        out = jax.vmap(lambda p, m: one((p, m)))(flat, flat_mask)
    return out.reshape(batch_shape + (npoint,))
