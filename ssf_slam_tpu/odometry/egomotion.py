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
    pts: Array, flow: Array, static_mask: Array,
    irls_iters: int = 0, irls_sigma: float = 0.05,
) -> tuple[Array, Array]:
    """Kabsch on static points: returns (q, t) with p_last = R p_curr + t.

    ``irls_iters`` > 0 adds Cauchy-weighted IRLS refinement (an upgrade over
    the reference's single unweighted SVD, PointCloudOdometry.py:15-33):
    points whose flow disagrees with the fitted rigid motion — typically
    movers the segmentation missed, THE error source of the learned-seg
    path — are downweighted by 1 / (1 + (r/sigma)^2) and the fit repeated.
    sigma is the expected static-point flow error (~predicted-flow EPE).
    """
    w = static_mask.astype(pts.dtype)
    src = pts + flow
    r, t = kabsch(src, pts, w)
    for _ in range(irls_iters):
        res = pts - (src @ r.T + t[None, :])
        r2 = jnp.sum(res * res, axis=-1)
        w_r = w / (1.0 + r2 / (irls_sigma * irls_sigma))
        r, t = kabsch(src, pts, w_r)
    return matrix_to_quat(r), t


def trim_static_mask(
    pts: Array, flow: Array, static: Array, q: Array, t: Array,
    max_resid: float,
) -> Array:
    """Residual-trim ``static`` against a fitted rigid motion.

    Keeps only points whose flow agrees with the rigid fit (q, t) to within
    ``max_resid`` meters: ``|pts - (R(q)(pts+flow) + t)| < max_resid``.
    The trimmed mask is what anchors GEOMETRY (the flow_refine source and
    the keyframe seg-gate) — a mask that merely voted in the Kabsch/IRLS
    average can tolerate leaked movers (they get downweighted), a mask that
    selects registration sources cannot (a coherent mover bloc produces a
    self-consistent wrong pose; see OdometryConfig.hypothesis_pick notes).
    No reference equivalent: the reference never feeds its masks to
    geometry (main_sju_occ_addSeg_Pointnet2_ros.py:360-378 stops at the SVD).
    """
    from ssf_slam_tpu.ops.se3 import quat_rotate

    pred = quat_rotate(q[None], pts + flow) + t[None]
    r2 = jnp.sum((pts - pred) ** 2, axis=-1)
    return static & (r2 < max_resid * max_resid)


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
    q, t = ego_motion_from_flow(pts, flow, bg,
                                irls_iters=cfg.irls_iters,
                                irls_sigma=cfg.irls_sigma)
    return q, t, bg
