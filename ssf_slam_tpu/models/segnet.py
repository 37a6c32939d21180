"""Static/moving point segmentation network.

TPU-native replacement for the external ``my_pointnet2_sem_seg`` classifier
the SSF variant loads via importlib (main_sju_occ_addSeg_Pointnet2_ros.py,
"MODEL LOADING" block): a PointNet++ semantic-segmentation net fed
[xyz || flow] per point, argmaxed into a static/moving mask that gates the
ego-motion SVD (same file :360-378). Also covers the simpler 6-layer MLP
flow classifier of ActiveSceneFlow_Classification.py:245-277 via
``n_sa_levels=0``.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ssf_slam_tpu.models.layers import PointMLP, SetAbstraction, SetUpConv
from ssf_slam_tpu.ops.neighbors import (
    cloud_box,
    invert_permutation,
    morton_sort,
)

Array = jax.Array


class SegNet(nn.Module):
    """PointNet++ sem-seg: [B,N,3] xyz + [B,N,C] feats -> [B,N,n_classes].

    ``neighbor_backend="banded"`` Morton-sorts the cloud at the stem and
    restores input order on the logits, running the SA/FP neighbor ops
    through the Pallas banded engine (ops/banded.py) — same fast path as
    TFlow, so the ssfc classifier adds no XLA-kNN calls to the fused step.
    """

    n_classes: int = 2
    sa_npoints: Sequence[int] = (1024, 256)
    sa_nsample: Sequence[int] = (16, 16)
    sa_mlps: Sequence[Sequence[int]] = ((32, 32, 64), (64, 64, 128))
    head: Sequence[int] = (128, 64)
    n_sa_levels: int = 2
    dtype: jnp.dtype = jnp.float32
    neighbor_backend: str = "xla"
    morton_extent: float = 64.0

    @nn.compact
    def __call__(
        self, xyz: Array, feats: Array, train: bool = False
    ) -> Array:
        if self.n_sa_levels == 0:
            # plain per-point MLP classifier (ActiveSceneFlow_Classification)
            x = PointMLP(self.head, use_bn=True, leaky=False,
                         dtype=self.dtype)(feats, train)
            return nn.Dense(self.n_classes, dtype=self.dtype)(x)

        perm = None
        box = None
        if self.neighbor_backend == "banded":
            box = cloud_box(xyz)
            xyz, perm = morton_sort(xyz, box=box)
            feats = jnp.take_along_axis(feats, perm[..., None], axis=-2)

        x = PointMLP((32,), use_bn=True, leaky=False, dtype=self.dtype,
                     name="stem")(jnp.concatenate([xyz, feats], -1), train)
        xyzs, skips = [xyz], [x]
        for i in range(self.n_sa_levels):
            sxyz, x, _ = SetAbstraction(
                npoint=self.sa_npoints[i],
                nsample=self.sa_nsample[i],
                mlp=self.sa_mlps[i],
                dtype=self.dtype,
                backend=self.neighbor_backend,
                extent=self.morton_extent,
                name=f"sa{i + 1}",
            )(xyzs[-1], x, train, box=box)
            xyzs.append(sxyz)
            skips.append(x)
        for i in reversed(range(self.n_sa_levels)):
            x = SetUpConv(
                8,
                (self.sa_mlps[i][-1],),
                (self.sa_mlps[i][-1],),
                dtype=self.dtype,
                backend=self.neighbor_backend,
                extent=self.morton_extent,
                name=f"fp{i + 1}",
            )(xyzs[i], xyzs[i + 1], skips[i], x, train, box=box)
        x = PointMLP(self.head, use_bn=True, leaky=False, dtype=self.dtype,
                     name="head")(x, train)
        logits = nn.Dense(self.n_classes, dtype=self.dtype)(x)
        if perm is not None:
            logits = jnp.take_along_axis(
                logits, invert_permutation(perm)[..., None], axis=-2)
        return logits
