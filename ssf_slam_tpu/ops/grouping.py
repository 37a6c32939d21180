"""Index gather / neighborhood grouping.

TPU-native replacement for pointnet2 ``gather_operation`` (utils/utils.py:228)
and ``grouping_operation`` (45 uses across the reference, e.g.
utils/utils.py:231-233, utils/soflow.py:392-409). Channels-LAST layout
([..., N, C] not the reference's [B, C, N]) — last-dim channels vectorize onto
the 128-lane VPU and feed the MXU without transposes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def gather_points(points: Array, idx: Array) -> Array:
    """points [..., N, C], idx [..., S] int -> [..., S, C]."""
    return jnp.take_along_axis(points, idx[..., None], axis=-2)


def group_points(points: Array, idx: Array) -> Array:
    """points [..., N, C], idx [..., S, K] int -> [..., S, K, C].

    Gathers K-neighborhoods for S centroids (grouping_operation semantics).
    """
    s, k = idx.shape[-2], idx.shape[-1]
    flat = idx.reshape(idx.shape[:-2] + (s * k,))
    out = jnp.take_along_axis(points, flat[..., None], axis=-2)
    return out.reshape(idx.shape[:-2] + (s, k, points.shape[-1]))
