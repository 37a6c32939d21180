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

Array = jax.Array


class SegNet(nn.Module):
    """PointNet++ sem-seg: [B,N,3] xyz + [B,N,C] feats -> [B,N,n_classes]."""

    n_classes: int = 2
    sa_npoints: Sequence[int] = (1024, 256)
    sa_nsample: Sequence[int] = (16, 16)
    sa_mlps: Sequence[Sequence[int]] = ((32, 32, 64), (64, 64, 128))
    head: Sequence[int] = (128, 64)
    n_sa_levels: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self, xyz: Array, feats: Array, train: bool = False
    ) -> Array:
        if self.n_sa_levels == 0:
            # plain per-point MLP classifier (ActiveSceneFlow_Classification)
            x = PointMLP(self.head, use_bn=True, leaky=False,
                         dtype=self.dtype)(feats, train)
            return nn.Dense(self.n_classes, dtype=self.dtype)(x)

        x = PointMLP((32,), use_bn=True, leaky=False, dtype=self.dtype,
                     name="stem")(jnp.concatenate([xyz, feats], -1), train)
        xyzs, skips = [xyz], [x]
        for i in range(self.n_sa_levels):
            sxyz, x, _ = SetAbstraction(
                npoint=self.sa_npoints[i],
                nsample=self.sa_nsample[i],
                mlp=self.sa_mlps[i],
                dtype=self.dtype,
                name=f"sa{i + 1}",
            )(xyzs[-1], x, train)
            xyzs.append(sxyz)
            skips.append(x)
        for i in reversed(range(self.n_sa_levels)):
            x = SetUpConv(
                8,
                (self.sa_mlps[i][-1],),
                (self.sa_mlps[i][-1],),
                dtype=self.dtype,
                name=f"fp{i + 1}",
            )(xyzs[i], xyzs[i + 1], skips[i], x, train)
        x = PointMLP(self.head, use_bn=True, leaky=False, dtype=self.dtype,
                     name="head")(x, train)
        return nn.Dense(self.n_classes, dtype=self.dtype)(x)
