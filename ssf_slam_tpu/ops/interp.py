"""Inverse-distance-weighted kNN interpolation.

TPU-native replacement for pointnet2 ``three_nn`` + interpolate
(utils/soflow.py:1442-1475 UpsampleFlow, utils/soflow.py:1222-1257
PointWarping's weight computation). Exact brute-force kNN (ops/knn.py) feeds
an inverse-distance softmax-like weighting, matching the reference's
``weight = (1/dist) / sum(1/dist)`` with the same 1e-10 distance clamp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ssf_slam_tpu.ops.grouping import group_points
from ssf_slam_tpu.ops.knn import knn

Array = jax.Array


def idw_weights(sqdist: Array, eps: float = 1e-2) -> Array:
    """[..., N, K] squared dists -> normalized inverse-distance weights.

    eps (1 cm — below sensor noise) is added INSIDE the sqrt: upsampling
    queries are often EXACT members of the sparse set (FPS subsets), where
    d(sqrt)/dx is infinite and 1/d gradients scale as eps^-3 — a tiny eps
    (the reference's 1e-10 clamp, soflow.py:1245) sends training gradients
    to infinity within a few steps. torch.norm special-cases the zero
    gradient; a decomposed sqrt does not.
    """
    dist = jnp.sqrt(jnp.maximum(sqdist, 0.0) + eps * eps)
    inv = 1.0 / dist
    return inv / jnp.sum(inv, axis=-1, keepdims=True)


def knn_interpolate(
    dense_xyz: Array,
    sparse_xyz: Array,
    sparse_feats: Array,
    k: int = 3,
    sparse_mask: Array | None = None,
    clamp: float | None = None,
) -> Array:
    """Interpolate sparse per-point features onto dense positions.

    dense_xyz [..., N, 3], sparse_xyz [..., S, 3], sparse_feats [..., S, C]
    -> [..., N, C]. Mirrors UpsampleFlow (soflow.py:1442-1475) including the
    optional output clamp (dense_flow.clamp(-100, 100) at :1474).
    """
    d, idx = knn(dense_xyz, sparse_xyz, k, points_mask=sparse_mask)
    w = idw_weights(d)  # [..., N, k]
    feats = group_points(sparse_feats, idx)  # [..., N, k, C]
    out = jnp.sum(w[..., None] * feats, axis=-2)
    if clamp is not None:
        out = jnp.clip(out, -clamp, clamp)
    return out


def three_nn_interpolate(
    dense_xyz: Array,
    sparse_xyz: Array,
    sparse_feats: Array,
    sparse_mask: Array | None = None,
    clamp: float | None = None,
) -> Array:
    """3-NN special case (pointnet2 ``three_nn`` + three_interpolate)."""
    return knn_interpolate(
        dense_xyz, sparse_xyz, sparse_feats, k=3, sparse_mask=sparse_mask,
        clamp=clamp,
    )
