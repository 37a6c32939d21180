"""Ego-motion from scene flow.

TPU-native replacement for the Python front-end publishers:
- GT-seg variant:  static points by ground-truth mask, Kabsch on GT flow
  (scripts/PointCloudOdometry.py:91-103)
- GMM variant:     2-component GMM over [flow || xyz] 6-D features, majority
  cluster = background, Kabsch on it
  (scripts/PointCloudOdometry_noSeg.py:97-118, main_sju_occ_ros.py:256-284)
- learned variant: segmentation logits from the SSF net produce the static
  mask (main_sju_occ_addSeg_Pointnet2_ros.py:360-378)

Convention (matches the reference exactly): given frame-1 points ``pts`` and
flow ``flow`` into frame 2, the published frame-to-frame transform maps the
CURRENT (frame-2) coordinates back into the LAST (frame-1) frame:
``slove_RT_by_SVD(src=pts+flow, dst=pts)`` => p_last = R p_curr + t
(PointCloudOdometry_noSeg.py:114-118 with src=target, dst=source).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ssf_slam_tpu.config import EgoMotionConfig
from ssf_slam_tpu.ops.gmm import gmm_background_mask
from ssf_slam_tpu.ops.kabsch import kabsch
from ssf_slam_tpu.ops.se3 import matrix_to_quat

Array = jax.Array


def ego_motion_from_flow(
    pts: Array, flow: Array, static_mask: Array
) -> tuple[Array, Array]:
    """Kabsch on static points: returns (q, t) with p_last = R p_curr + t."""
    w = static_mask.astype(pts.dtype)
    r, t = kabsch(pts + flow, pts, w)
    return matrix_to_quat(r), t


@jax.jit
def ego_motion_gt_seg(
    pts: Array, flow: Array, fg_mask: Array, valid: Array
) -> tuple[Array, Array]:
    """Seg variant: GT foreground mask gates movers (PointCloudOdometry.py:91)."""
    static = (fg_mask < 0.5) & valid
    return ego_motion_from_flow(pts, flow, static)


@functools.partial(jax.jit, static_argnames=("cfg",))
def ego_motion_gmm(
    pts: Array,
    flow: Array,
    valid: Array,
    cfg: EgoMotionConfig = EgoMotionConfig(),
) -> tuple[Array, Array, Array]:
    """noSeg/SF variant: GMM split over [flow || xyz] then Kabsch.

    Returns (q, t, background_mask).
    """
    feats = jnp.concatenate([flow, pts], axis=-1)
    bg = gmm_background_mask(feats, mask=valid, n_iters=cfg.gmm_iters)
    q, t = ego_motion_from_flow(pts, flow, bg)
    return q, t, bg
