"""Farthest point sampling.

TPU-native replacement for the pointnet2 CUDA ``furthest_point_sample``
(utils/utils.py:226). The algorithm is inherently sequential in the sample
index; each iteration is a fully-vectorized distance update + argmax inside a
``lax.fori_loop``.

A sequential loop of npoint iterations is latency-bound on TPU (~10 ms for
2048 samples), so the default is BUCKETED FPS: the cloud is split into G
contiguous chunks and FPS runs vmapped across chunks, each picking npoint/G
samples — npoint/G sequential steps instead of npoint (measured 30x faster at
the 8192->2048 operating point). With randomly-ordered clouds (CARLA frames
are random subsamples of dense scans) chunks are uniform spatial subsets, so
the union of per-chunk FPS spreads like global FPS. ``groups=1`` recovers the
exact CUDA-op semantics (start at index 0, global argmax each step).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

Array = jax.Array


def _pick_groups(n: int, npoint: int) -> int:
    """Largest G <= 64 dividing both n and npoint (>= 8 samples per group).

    Sequential FPS iterations cost ~5 us each on TPU (latency-bound); at
    the sa1 scale (8192 -> 2048) G=64 leaves 32 iterations with 32 samples
    per strided bucket — fill-distance measured within the spread gate of
    tests/test_ops.py::test_fps_bucketed_spreads.
    """
    g = 64
    while g > 1 and (n % g or npoint % g or npoint // g < 8):
        g //= 2
    return g


@functools.partial(jax.jit, static_argnames=("npoint", "groups"))
def farthest_point_sample(
    xyz: Array, npoint: int, mask: Array | None = None,
    groups: int | None = None,
) -> Array:
    """FPS indices.

    Args:
      xyz: [..., N, 3] points.
      npoint: number of samples (static).
      mask: optional [..., N] bool validity; invalid points are never sampled
        (if fewer than npoint valid points exist, indices repeat).
      groups: bucket count (see module docstring); None = auto, 1 = exact.

    Returns:
      [..., npoint] int32 indices into N.
    """
    batch_shape = xyz.shape[:-2]
    n = xyz.shape[-2]
    if groups is None:
        groups = _pick_groups(n, npoint)
    if groups > 1:
        chunk = n // groups
        per = npoint // groups
        # STRIDED bucket membership (i % G), not contiguous (i // G): with
        # randomly-ordered clouds either split is a uniform spatial subset,
        # but the banded neighbor engine Morton-sorts clouds before the net —
        # contiguous chunks would then be spatial REGIONS and per-chunk FPS
        # would sample density-proportionally instead of spreading. Strided
        # chunks of a Morton-sorted cloud are uniform subsets in both cases.
        gx = jnp.moveaxis(
            xyz.reshape(batch_shape + (chunk, groups, 3)), -2, -3
        )  # [..., groups, chunk, 3]
        gm = (
            None if mask is None
            else jnp.moveaxis(
                mask.reshape(batch_shape + (chunk, groups)), -1, -2)
        )
        local = farthest_point_sample(gx, per, gm, groups=1)
        offset = jnp.arange(groups, dtype=jnp.int32)[:, None]
        return (local * groups + offset).reshape(batch_shape + (npoint,))

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
