"""PointNet++-style building blocks in Flax, channels-last.

TPU-native replacements for the torch modules backed by pointnet2 CUDA ops:
- ``SetAbstraction``  <- PointNetSetAbstraction (utils/utils.py:185-248)
- ``SetUpConv``       <- PointNetSetUpConv (utils/utils.py:250-315)
- ``UpsampleFlow``    <- UpsampleFlow (utils/soflow.py:1442-1475)
- ``PointWarping``    <- PointWarping (utils/soflow.py:1222-1257)

Layout: [B, N, C] (channels last) everywhere, not the reference's [B, C, N]:
pointwise MLPs become Dense ops on the last dim, which XLA maps straight onto
the MXU with no transposes; kNN/gather run through ops/knn + ops/grouping.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ssf_slam_tpu.ops.fps import farthest_point_sample
from ssf_slam_tpu.ops.grouping import gather_points
from ssf_slam_tpu.ops.neighbors import nn_knn_group, nn_knn_idw

Array = jax.Array

LEAKY_RATE = 0.1  # TFlowV3_Occlussion.py:18


class PointMLP(nn.Module):
    """Stack of pointwise Dense(+BN)+activation layers (Conv1d/2d k=1 stacks).

    Matches the reference conv blocks: bias only when not followed by BN
    (utils/utils.py:196, soflow Conv1d :1269).

    ``x`` may be a LIST of parts instead of one pre-concatenated tensor:
    ``Dense(concat(parts))`` distributes as ``sum_i Dense_i(part_i)``, so
    the first layer is applied per part and summed. Parts of lower rank
    (per-point features vs per-neighbor [..., K, C] tensors) broadcast into
    the sum — the [..., K, C_part] tile of a per-point feature is never
    materialized and its first-layer matmul runs at 1/K cost. This is
    exactly the torch stack's math (concat then conv1x1), restructured for
    HBM traffic.
    """

    features: Sequence[int]
    use_bn: bool = False
    leaky: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False) -> Array:
        for i, f in enumerate(self.features):
            if i == 0 and isinstance(x, (list, tuple)):
                rank = max(p.ndim for p in x)
                y = None
                for j, p in enumerate(x):
                    d = nn.Dense(
                        f, use_bias=(not self.use_bn) and j == 0,
                        dtype=self.dtype, name=f"Dense_{i}_part{j}",
                    )(p.astype(self.dtype))
                    while d.ndim < rank:
                        d = d[..., None, :]
                    y = d if y is None else y + d
                x = y
            else:
                x = nn.Dense(f, use_bias=not self.use_bn, dtype=self.dtype,
                             name=f"Dense_{i}")(x)
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9,
                    epsilon=1e-3,  # dead-ReLU channels have ~0 variance;
                    dtype=self.dtype,  # rsqrt grads at 1e-5 overflow f32
                    name=f"BatchNorm_{i}",
                )(x)
            x = nn.leaky_relu(x, LEAKY_RATE) if self.leaky else nn.relu(x)
        return x


class SetAbstraction(nn.Module):
    """FPS -> kNN group -> [dxyz || feats] -> MLP -> max-pool.

    utils/utils.py:208-248 semantics (knn branch; group_all unused by TFlow).
    """

    npoint: int
    nsample: int
    mlp: Sequence[int]
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32
    backend: str = "xla"
    extent: float = 64.0

    @nn.compact
    def __call__(
        self,
        xyz: Array,  # [B, N, 3]
        feats: Array,  # [B, N, C]
        train: bool = False,
        fps_idx: Array | None = None,
        box=None,
    ) -> tuple[Array, Array, Array]:
        if fps_idx is None:
            fps_idx = farthest_point_sample(xyz, self.npoint)  # [B, S]
            # ascending order preserves the Morton-sorted invariant the
            # banded neighbor engine relies on (a sorted subset of a sorted
            # array stays sorted); order is semantically irrelevant otherwise
            fps_idx = jnp.sort(fps_idx, axis=-1)
        new_xyz = gather_points(xyz, fps_idx)  # [B, S, 3]
        # fused kNN + gather: xyz/feats share the index set
        idx, grouped, _, _ = nn_knn_group(
            new_xyz, xyz, jnp.concatenate([xyz, feats], -1), self.nsample,
            backend=self.backend, extent=self.extent, box=box)
        pos_diff = grouped[..., :3] - new_xyz[..., None, :]
        x = PointMLP(self.mlp, use_bn=self.use_bn, leaky=False,
                     dtype=self.dtype)([pos_diff, grouped[..., 3:]], train)
        new_feats = jnp.max(x, axis=-2)  # [B, S, mlp[-1]]
        return new_xyz, new_feats, fps_idx


class SetUpConv(nn.Module):
    """Feature propagation sparse -> dense with skip connection.

    utils/utils.py:274-315: kNN of dense into sparse, MLP over
    [sparse_feats || dxyz], max-pool, concat dense skip feats, second MLP.
    """

    nsample: int
    mlp: Sequence[int]
    mlp2: Sequence[int]
    use_bn: bool = True
    dtype: jnp.dtype = jnp.float32
    backend: str = "xla"
    extent: float = 64.0

    @nn.compact
    def __call__(
        self,
        dense_xyz: Array,  # [B, N, 3]
        sparse_xyz: Array,  # [B, S, 3]
        dense_feats: Array | None,  # [B, N, C1] skip
        sparse_feats: Array,  # [B, S, C2]
        train: bool = False,
        box=None,
    ) -> Array:
        idx, grouped, _, _ = nn_knn_group(
            dense_xyz, sparse_xyz,
            jnp.concatenate([sparse_xyz, sparse_feats], -1), self.nsample,
            backend=self.backend, extent=self.extent,
            box=box)  # fused, co-indexed
        pos_diff = grouped[..., :3] - dense_xyz[..., None, :]
        if self.mlp:
            x = PointMLP(self.mlp, use_bn=self.use_bn, leaky=False,
                         dtype=self.dtype)([grouped[..., 3:], pos_diff],
                                           train)
        else:
            x = jnp.concatenate([grouped[..., 3:], pos_diff], axis=-1)
        x = jnp.max(x, axis=-2)  # [B, N, mlp[-1]]
        if dense_feats is not None:
            x = jnp.concatenate([x, dense_feats], axis=-1)
        if self.mlp2:
            x = PointMLP(self.mlp2, use_bn=self.use_bn, leaky=False,
                         dtype=self.dtype)(x, train)
        return x


def upsample_flow(
    dense_xyz: Array,
    sparse_xyz: Array,
    sparse_flow: Array,
    k: int = 3,
    clamp: float = 100.0,
    backend: str = "xla",
    extent: float = 64.0,
    box=None,
) -> Array:
    """Inverse-distance kNN feature/flow upsampling (soflow.py:1442-1475)."""
    out = nn_knn_idw(dense_xyz, sparse_xyz, sparse_flow, k,
                     backend=backend, extent=extent, box=box)
    return jnp.clip(out, -clamp, clamp)


def upsample_multi(
    dense_xyz: Array,
    sparse_xyz: Array,
    fields: Sequence[Array],
    k: int = 3,
    clamp: float = 100.0,
    backend: str = "xla",
    extent: float = 64.0,
    box=None,
) -> list:
    """Upsample several co-located fields with ONE kNN + ONE gather.

    The per-level decoder upsamples flow, flow features, and cost features
    between the same point sets; sharing the neighbor search and fusing the
    gathers removes the dominant per-level cost.
    """
    cat = jnp.concatenate(list(fields), axis=-1)
    out = nn_knn_idw(dense_xyz, sparse_xyz, cat, k,
                     backend=backend, extent=extent, box=box)
    out = jnp.clip(out, -clamp, clamp)
    splits, parts = 0, []
    for f in fields:
        parts.append(out[..., splits:splits + f.shape[-1]])
        splits += f.shape[-1]
    return parts


def point_warping(
    pos1: Array,
    pos2: Array,
    flow1: Array | None,
    nsample: int = 3,
    clamp: float = 10.0,
    backend: str = "xla",
    extent: float = 64.0,
    box=None,
) -> Array:
    """Warp pos2 backward by flow interpolated at pos2 (soflow.py:1222-1257).

    pos1 + flow1 -> kNN onto pos2 -> inverse-distance flow interpolation ->
    pos2 - interp_flow, clamped. On the banded path the target cloud
    (pos1 + flow) is only NEAR-Morton-sorted — flows are small relative to
    the band width, so the band plan stays valid (quality-checked in
    tests/test_banded.py).
    """
    if flow1 is None:
        return pos2
    pos1_to_2 = pos1 + flow1[..., :3]
    flow2 = nn_knn_idw(pos2, pos1_to_2, flow1, nsample,
                       backend=backend, extent=extent, box=box)
    return jnp.clip(pos2 - flow2[..., :3], -clamp, clamp)
