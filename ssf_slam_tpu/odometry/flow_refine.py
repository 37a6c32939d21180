"""Seg-gated geometric refinement of the flow ego-motion pose.

The learned-flow variants (SF/SSF) compute ego-motion by a Kabsch/IRLS fit on
predicted scene flow — so the pose inherits the flow error directly, and
predicted-flow error is spatially CORRELATED (a biased patch of flow does not
average out over points the way white noise would). That bias is the entire
remaining ATE budget of the SSF path: with GT flow the same pipeline tracks at
millimeters (noSeg), with predicted flow at several centimeters.

Geometry does not inherit flow error. This module re-registers the pose with a
point-to-plane Gauss-Newton: source = the static-masked previous cloud (the
learned segmentation removes movers — the exact failure that sank both plain
geometric odometry in dynamic scenes, onlyPC at meters of ATE, and the
scan-to-submap refinement whose keyframe clouds retain mover points), target =
the current scan's ring-diverse planar features (the same high-quality local
planes the geometric odometry uses, odometry/scan2scan.py). The flow pose is
the init AND the prior anchor, so the solve only has to absorb the
centimeter-scale flow bias, association stays unambiguous, and weakly-observed
directions (straight-corridor along-track) fall back to the flow estimate
instead of wandering.

The reference has no equivalent: its SSF ego-motion is the bare seg-gated SVD
(scripts/ActiveSceneFlow/main_sju_occ_addSeg_Pointnet2_ros.py:360-378), which
is exactly the `geom_refine=False` behavior. Acceptance gates (inlier count,
max correction vs the flow pose) make the refinement fail-safe: when geometry
is degenerate or contaminated the flow pose ships unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ssf_slam_tpu.config import EgoMotionConfig
from ssf_slam_tpu.frontend.features import FeatureCloud
from ssf_slam_tpu.odometry.scan2scan import PlaneModel, _huber_weight
from ssf_slam_tpu.ops.knn import nearest_neighbor
from ssf_slam_tpu.ops.precision import GEOM
from ssf_slam_tpu.ops.se3 import (
    quat_conjugate,
    quat_multiply,
    quat_normalize,
    quat_rotate,
    so3_exp_quat,
    so3_log_quat,
)

Array = jax.Array


@functools.partial(jax.jit, static_argnames=("cfg",))
def refine_flow_pose(
    prev_pts: Array,
    static_w: Array,
    curr_feat: FeatureCloud,
    curr_planes: PlaneModel,
    q0: Array,
    t0: Array,
    cfg: EgoMotionConfig = EgoMotionConfig(),
) -> tuple[Array, Array]:
    """Refine the flow pose (q0, t0) with seg-gated point-to-plane GN.

    Args:
      prev_pts: [N, 3] previous scan (the flow pair's frame-1 cloud).
      static_w: [N] bool — learned static mask AND validity.
      curr_feat / curr_planes: the current scan's planar features and their
        ring-diverse local planes (``fit_ring_diverse_planes``).
      q0, t0: flow ego-motion estimate, p_last = R(q0) p_curr + t0.

    Returns (q, t) in the same convention; the unrefined (q0, t0) whenever an
    acceptance gate fails.
    """
    # Solve in the prev->curr direction (sources transform INTO the current
    # frame where the planes live): p_curr = R(qi) p_prev + ti, initialized
    # at the inverse of the flow pose.
    qi0 = quat_conjugate(q0)
    ti0 = -quat_rotate(qi0[None], t0[None])[0]

    # Strided source subsample: scan order is row-major/azimuth-sorted, so a
    # stride spans all rings and azimuths (uniform spatial coverage) at fixed
    # shape — no data-dependent compaction inside jit.
    src = prev_pts[:: cfg.refine_src_stride]
    w_src = static_w[:: cfg.refine_src_stride].astype(prev_pts.dtype)

    tgt_valid = curr_feat.mask & curr_planes.valid
    # far sources lever the rotation block quadratically while their
    # association ambiguity grows with range (see OdometryConfig notes)
    rng_pt = jnp.linalg.norm(src, axis=-1)
    w_range = 1.0 / (1.0 + (rng_pt / 30.0) ** 2)

    w_prior = jnp.concatenate([
        jnp.full((3,), cfg.refine_prior_rot),
        jnp.full((3,), cfg.refine_prior_trans),
    ])

    def associate(q, t):
        y = quat_rotate(q[None], src) + t[None]
        d, seed = nearest_neighbor(y, curr_feat.xyz, points_mask=tgt_valid)
        ok = (
            (w_src > 0)
            & tgt_valid[seed]
            & (d < cfg.refine_assoc_max_dist**2)
        )
        return curr_feat.xyz[seed], curr_planes.normal[seed], ok

    def gn_iteration(_, carry):
        q, t, pa, nrm, ok = carry
        u = quat_rotate(q[None], src)
        r = jnp.einsum("fc,fc->f", u + t[None] - pa, nrm, precision=GEOM)
        w = (
            _huber_weight(r, cfg.refine_huber)
            * w_range
            * w_src
            * ok.astype(r.dtype)
        )
        j_rot = jnp.cross(u, nrm)
        jac = jnp.concatenate([j_rot, nrm], axis=-1)  # [S, 6]
        h = jnp.einsum("fi,fj->ij", jac * w[:, None], jac, precision=GEOM)
        g = jnp.einsum("fi,f->i", jac, w * r, precision=GEOM)
        # prior anchored at the flow pose: geometry corrects it only where
        # the planes actually constrain the correction
        r_prior = jnp.concatenate([
            so3_log_quat(quat_multiply(q, quat_conjugate(qi0))),
            t - ti0,
        ])
        h = h + jnp.diag(w_prior) + 1e-6 * jnp.eye(6, dtype=h.dtype)
        g = g + w_prior * r_prior
        delta = -jnp.linalg.solve(h, g)
        delta = jnp.concatenate([
            jnp.clip(delta[:3], -cfg.refine_max_rot_step,
                     cfg.refine_max_rot_step),
            jnp.clip(delta[3:], -cfg.refine_max_trans_step,
                     cfg.refine_max_trans_step),
        ])
        q = quat_normalize(quat_multiply(so3_exp_quat(delta[:3]), q))
        t = t + delta[3:]
        return q, t, pa, nrm, ok

    def outer(_, carry):
        q, t = carry
        pa, nrm, ok = associate(q, t)
        q, t, *_ = jax.lax.fori_loop(
            0, cfg.refine_gn_iters, gn_iteration, (q, t, pa, nrm, ok)
        )
        return q, t

    qi, ti = jax.lax.fori_loop(0, cfg.refine_outer, outer, (qi0, ti0))

    _, _, ok = associate(qi, ti)
    n_inliers = jnp.sum(ok.astype(jnp.int32))

    # back to the published convention p_last = R p_curr + t
    q = quat_conjugate(qi)
    t = -quat_rotate(q[None], ti[None])[0]

    # fail-safe gates: geometry must have had enough constraints and must
    # not contradict the flow pose by more than the flow's own error scale
    d_trans = jnp.linalg.norm(t - t0)
    d_rot = jnp.linalg.norm(so3_log_quat(quat_multiply(q, quat_conjugate(q0))))
    accept = (
        (n_inliers >= cfg.refine_min_inliers)
        & (d_trans <= cfg.refine_max_trans)
        & (d_rot <= cfg.refine_max_rot)
    )
    q = jnp.where(accept, q, q0)
    t = jnp.where(accept, t, t0)
    return q, t
