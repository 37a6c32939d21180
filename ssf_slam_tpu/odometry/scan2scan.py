"""Scan-to-scan point-to-plane Gauss-Newton odometry.

TPU-native replacement for the lidarOdometry_onlyPC node
(src/lidarOdometry_onlyPC.cpp) + Ceres. The reference, per current planar
point: warp into the last frame (:74-82), KD-tree 1-NN seed (:168), 30-NN
around the seed (:173), pick 5 neighbors preferring >=2 from different scan
rings (:180-205), QR plane fit (:207-220), coplanarity check (:221-232), then
a Ceres AutoDiff point-to-plane solve with Huber(0.1) and quaternion
parameterization, 2 re-association passes x 8 iterations (:160,243-249).

TPU-first restructuring (behavior-preserving):
- The 30-NN + ring-diverse 5-point pick + plane fit depend only on the LAST
  cloud, not on the pose iterate — so they are hoisted out of the optimization
  into a per-frame precompute (``fit_ring_diverse_planes``): one batched kNN,
  one vectorized ring-diversity selection, one batched 3x3 normal-equation
  solve. The per-point sequential loop disappears entirely.
- The sequential ring-diverse pick (:180-205) becomes a cumulative-sum
  selection over the sorted neighbor list (exact same choice).
- Ceres' damped NLLS becomes explicit Gauss-Newton with Huber IRLS weights on
  an so(3)+R^3 left-perturbation, fori_loop(outer=2){ associate;
  fori_loop(8){ GN step } } — same solver budget.
All correspondence work is masked: padded points and failed plane fits carry
zero weight.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ssf_slam_tpu.config import OdometryConfig
from ssf_slam_tpu.frontend.features import FeatureCloud
from ssf_slam_tpu.ops.eig3 import smallest_eigvec_sym3
from ssf_slam_tpu.ops.grouping import group_points
from ssf_slam_tpu.ops.knn import knn, nearest_neighbor
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


class PlaneModel(NamedTuple):
    """Per-point local plane of a feature cloud (precomputed once per frame)."""

    normal: Array  # [F, 3] unit normals
    valid: Array  # [F] bool — fit passed distance + coplanarity gates


def _ring_diverse_five(
    nbr_dist: Array, nbr_ring: Array, k: int
) -> tuple[Array, Array]:
    """Vectorized 5-point ring-diverse neighbor selection.

    Mirrors src/lidarOdometry_onlyPC.cpp:180-205: start with the 5 nearest;
    among neighbors 5..k-1 whose ring differs from the nearest neighbor's
    ring, the first replaces slot 4 and the second replaces slot 3; the gate
    distance index n is the last such pick (or 5 when none found).

    Args:
      nbr_dist: [F, k] sorted squared distances.
      nbr_ring: [F, k] ring ids of the neighbors.

    Returns:
      (slots [F, 5] int32 positions into the k neighbors, gate_dist [F]
       squared distance used for the < max_fit_dist^2 acceptance).
    """
    f = nbr_dist.shape[0]
    pos = jnp.arange(k, dtype=jnp.int32)[None, :]  # [1, k]
    p_row = nbr_ring[:, 0:1]
    diff = (nbr_ring != p_row) & (pos >= 5) & (nbr_ring >= 0) & (nbr_ring <= 63)
    cum = jnp.cumsum(diff.astype(jnp.int32), axis=1)
    first = diff & (cum == 1)
    second = diff & (cum == 2)
    has1 = jnp.any(first, axis=1)
    has2 = jnp.any(second, axis=1)
    i1 = jnp.argmax(first, axis=1).astype(jnp.int32)
    i2 = jnp.argmax(second, axis=1).astype(jnp.int32)

    base = jnp.tile(jnp.arange(5, dtype=jnp.int32)[None], (f, 1))
    # one different-ring point found -> it takes slot 4 (cpp:199-201)
    slot4 = jnp.where(has1, i1, base[:, 4])
    # two found -> slots 3 and 4 (cpp:202-205)
    slot3 = jnp.where(has2, i1, base[:, 3])
    slot4 = jnp.where(has2, i2, slot4)
    slots = jnp.concatenate(
        [base[:, :3], slot3[:, None], slot4[:, None]], axis=1
    )
    # gate index n: second pick if found, else first pick, else 5 (cpp:178,207)
    n_idx = jnp.where(has2, i2, jnp.where(has1, i1, jnp.int32(5)))
    n_idx = jnp.minimum(n_idx, k - 1)
    gate_dist = jnp.take_along_axis(nbr_dist, n_idx[:, None], axis=1)[:, 0]
    return slots, gate_dist


@functools.partial(jax.jit, static_argnames=("cfg",))
def fit_ring_diverse_planes(
    cloud: FeatureCloud, cfg: OdometryConfig = OdometryConfig()
) -> PlaneModel:
    """Precompute per-point local planes of a feature cloud.

    For each point: 30-NN (cfg.knn_neighbors), ring-diverse 5-point selection,
    plane fit solving A n = -1 (src/lidarOdometry_onlyPC.cpp:207-220) via 3x3
    normal equations, coplanarity validation (:221-232).
    """
    k = cfg.knn_neighbors
    # approx candidates + exact re-rank: ~8x faster than the exact
    # HIGHEST-precision path; a ~5% neighbor miss rate only perturbs
    # which 5 of ~16 near points form each plane fit
    d, idx = knn(cloud.xyz, cloud.xyz, k, points_mask=cloud.mask, approx=True)
    nbr_ring = cloud.ring[idx]  # [F, k]
    slots, gate_dist = _ring_diverse_five(d, nbr_ring, k)

    five_idx = jnp.take_along_axis(idx, slots, axis=1)  # [F, 5]
    pts5 = group_points(cloud.xyz, five_idx)  # [F, 5, 3]
    used_dist = jnp.take_along_axis(d, slots, axis=1)  # [F, 5] squared

    # Total-least-squares plane fit: normal = eigenvector of the smallest
    # eigenvalue of the centered covariance. The reference solves A n = -1 by
    # QR (cpp:207-220) — identical on valid planes, but TLS also yields the
    # spread eigenvalues we use for the conditioning gate below. Closed-form
    # 3x3 spectrum (ops/eig3.py): jnp.linalg.eigh on the [F,3,3] batch costs
    # ~10 ms/scan on-chip, the analytic form is pure VPU math.
    mean5 = jnp.mean(pts5, axis=1, keepdims=True)
    c5 = pts5 - mean5
    cov = jnp.einsum("fkc,fkd->fcd", c5, c5, precision=GEOM)
    evals, normal = smallest_eigvec_sym3(cov)  # ascending eigenvalues

    # coplanarity: consecutive-pair differences projected on the normal
    # (cpp:222-232 checks |n . (p_k - p_{k+1})| > planeMax)
    dvec = pts5[:, :4] - pts5[:, 1:]
    proj = jnp.abs(jnp.einsum("fkc,fc->fk", dvec, normal, precision=GEOM))
    coplanar = jnp.max(proj, axis=1) <= cfg.coplanar_max

    # distance gate: farthest point actually used in the fit must be within
    # the (range-adaptive) limit. The reference code gates on the n-th
    # *neighbor* (cpp:207), but its stated intent ("若5点中最远的点小于1米")
    # is the farthest USED point — and an absolute limit starves far-field
    # observability (see OdometryConfig.range_gate_factor).
    del gate_dist
    rng_pt = jnp.linalg.norm(cloud.xyz, axis=-1)
    limit = jnp.maximum(cfg.max_fit_dist, cfg.range_gate_factor * rng_pt)
    within = jnp.max(used_dist, axis=1) < limit**2

    # conditioning: the 5 points must spread in two directions, or the normal
    # is arbitrary. The reference gets this implicitly from ring diversity;
    # near-collinear same-ring stacks must be rejected explicitly here.
    well_conditioned = evals[..., 1] > 1e-3

    five_valid = jnp.all(cloud.mask[five_idx], axis=1)
    valid = cloud.mask & five_valid & coplanar & within & well_conditioned
    return PlaneModel(normal=normal, valid=valid)


def _huber_weight(r: Array, delta: float) -> Array:
    """IRLS weight of the Huber loss (Ceres HuberLoss(0.1), cpp:149)."""
    a = jnp.abs(r)
    return jnp.where(a <= delta, 1.0, delta / jnp.maximum(a, 1e-12))


@functools.partial(jax.jit, static_argnames=("cfg",))
def scan_to_scan(
    curr: FeatureCloud,
    last: FeatureCloud,
    last_planes: PlaneModel,
    init_q: Array,
    init_t: Array,
    cfg: OdometryConfig = OdometryConfig(),
    curr_planes: PlaneModel | None = None,
) -> tuple[Array, Array, Array]:
    """Estimate T_last_curr: p_last = R(q) p_curr + t.

    Args:
      curr, last: feature clouds of the current / previous scan.
      last_planes: precomputed ``fit_ring_diverse_planes(last)``.
      init_q, init_t: warm start (the previous frame-to-frame motion — the
        reference reuses para_q/para_t across frames, cpp:62-63).
      curr_planes: optional normals of the CURRENT cloud. When given,
        association is normal-compatible: each current point matches the
        nearest last-frame plane whose normal aligns with its own. This is
        the robustness upgrade over the reference's bare 1-NN seed (cpp:168):
        at highway-speed inter-frame motion (> feature spacing) bare NN pairs
        wall points with ground planes, whose vertical normals exert no pull
        along the motion, and the solve stalls near its init.

    Returns:
      (q [4], t [3], n_inliers scalar) — matching the reference's constant
      -velocity warm-started Ceres solve.
    """
    po = curr.xyz
    last_valid = last.mask & last_planes.valid

    if cfg.bev_init:
        # Global (yaw, dx, dy) init (see odometry/bev_init.py) — the GN
        # below is a local method; this makes the per-frame solve globally
        # convergent regardless of warm-start quality. The BEV estimate is
        # a SECOND HYPOTHESIS, not a replacement: near-periodic roadside
        # structure makes the BEV correlation multi-peaked along the road,
        # and its argmax can alias one building period away (observed:
        # 0.7 m off with the truth peak within counting noise of it — one
        # such frame was the whole corridor-ATE budget). No correlation-
        # score test separates that from the stale-warm-start case the BEV
        # init exists to rescue (on a corridor ridge BOTH score near the
        # peak), so the solve runs from both anchors and the final point-to-
        # plane residual — which DOES tell a slid pose from the true one via
        # the oblique/perpendicular planes — picks the winner.
        from ssf_slam_tpu.odometry.bev_init import bev_pose_init
        from ssf_slam_tpu.ops.se3 import quat_from_rpy

        rotated = quat_rotate(init_q[None], po)
        # the warm start (= constant-velocity prediction) bounds the
        # plausible search region: see bev_pose_init's dynamics window
        dyaw, shift = bev_pose_init(
            rotated, curr.mask, last.xyz, last.mask,
            pred_t=init_t, plaus_gate=cfg.bev_plaus_gate,
            plaus_rel=cfg.bev_plaus_rel,
        )
        zero = jnp.zeros_like(dyaw)
        bev_q = quat_multiply(quat_from_rpy(zero, zero, dyaw), init_q)
        bev_t = jnp.array([shift[0], shift[1], init_t[2]])
        init_qs = jnp.stack([init_q, bev_q])
        init_ts = jnp.stack([init_t, bev_t])
    else:
        init_qs = init_q[None]
        init_ts = init_t[None]

    def associate(q, t):
        warped = quat_rotate(q[None], po) + t[None]
        if curr_planes is None:
            d_seed, seed = nearest_neighbor(
                warped, last.xyz, points_mask=last_valid
            )  # k=1 exact (cheap)
        else:
            d, cand = knn(
                warped, last.xyz, cfg.assoc_neighbors, points_mask=last_valid,
                approx=True,
            )  # [F, A]; a missed candidate = one dropped correspondence
            n_c = quat_rotate(q[None], curr_planes.normal)  # rotated normals
            n_l = last_planes.normal[cand]  # [F, A, 3]
            align = jnp.abs(jnp.einsum("fc,fac->fa", n_c, n_l, precision=GEOM))
            # no own normal -> plain nearest (no penalty)
            align = jnp.where(curr_planes.valid[:, None], align, 1.0)
            score = d + cfg.assoc_normal_penalty * (1.0 - align)
            j = jnp.argmin(score, axis=-1)
            seed = jnp.take_along_axis(cand, j[:, None], axis=-1)[:, 0]
            d_seed = jnp.take_along_axis(d, j[:, None], axis=-1)[:, 0]
        pa = last.xyz[seed]
        nrm = last_planes.normal[seed]
        # Correspondence-distance gate: a current point whose nearest USABLE
        # plane is far has no true counterpart (occlusion, mover, or a
        # surface whose planes all failed the fit gates) — it must be
        # dropped, not matched to whatever is nearest (a surface 10 m away
        # otherwise pulls the solve with full weight).
        w_valid = (
            curr.mask
            & last_valid[seed]
            & (d_seed < cfg.assoc_max_dist**2)
        )
        return pa, nrm, w_valid

    # Range-dependent measurement noise: plane-fit error and association
    # ambiguity grow with range, while the rotation Jacobian's lever arm
    # grows quadratically in H — unweighted far points dominate the rotation
    # block and a small yaw error slings them into wrong associations that
    # drag the solve away (observed: warm start 8 cm from truth marching to
    # -1 m). sigma ~ sigma0 * (1 + (r/r0)^2) caps that leverage.
    rng_pt = jnp.linalg.norm(po, axis=-1)
    w_range = 1.0 / (1.0 + (rng_pt / cfg.range_sigma_scale) ** 2)

    w_prior = jnp.concatenate([
        jnp.full((3,), cfg.prior_rot_weight),
        jnp.full((3,), cfg.prior_trans_weight),
    ])

    def solve(anchor_q, anchor_t):
        """Full GN solve with the constant-velocity-style prior anchored at
        (anchor_q, anchor_t). Returns (q, t, n_inliers, score): score is the
        mean Huber point-to-plane residual at the solution — the model-
        selection statistic for the multi-hypothesis pick below."""

        def gn_iteration(_, carry):
            q, t, pa, nrm, w_valid = carry
            u = quat_rotate(q[None], po)  # rotated current points
            r = jnp.einsum("fc,fc->f", u + t[None] - pa, nrm, precision=GEOM)
            w = (
                _huber_weight(r, cfg.huber_delta)
                * w_range
                * w_valid.astype(r.dtype)
            )
            # J = [u x n, n] for left perturbation R <- exp(w^)R
            j_rot = jnp.cross(u, nrm)
            jac = jnp.concatenate([j_rot, nrm], axis=-1)  # [F, 6]
            h = jnp.einsum("fi,fj->ij", jac * w[:, None], jac, precision=GEOM)
            g = jnp.einsum("fi,f->i", jac, w * r, precision=GEOM)
            # constant-velocity prior (J = I under left perturbation)
            r_prior = jnp.concatenate([
                so3_log_quat(quat_multiply(q, quat_conjugate(anchor_q))),
                t - anchor_t,
            ])
            h = h + jnp.diag(w_prior)
            g = g + w_prior * r_prior
            # Levenberg damping stabilizes the weakly-observed directions
            h = (h + cfg.lm_lambda * jnp.diag(jnp.diagonal(h))
                 + 1e-6 * jnp.eye(6, dtype=h.dtype))
            delta = -jnp.linalg.solve(h, g)
            # trust region: one association is only valid locally; large
            # jumps must be re-associated before being trusted
            delta = jnp.concatenate([
                jnp.clip(delta[:3], -cfg.max_rot_step, cfg.max_rot_step),
                jnp.clip(delta[3:], -cfg.max_trans_step, cfg.max_trans_step),
            ])
            dq = so3_exp_quat(delta[:3])
            q = quat_normalize(quat_multiply(dq, q))
            t = t + delta[3:]
            return q, t, pa, nrm, w_valid

        def outer(_, carry):
            q, t = carry
            pa, nrm, w_valid = associate(q, t)
            q, t, *_ = jax.lax.fori_loop(
                0, cfg.gn_iters, gn_iteration, (q, t, pa, nrm, w_valid)
            )
            return q, t

        q, t = jax.lax.fori_loop(
            0, cfg.outer_iters, outer, (anchor_q, anchor_t)
        )
        pa, nrm, w_valid = associate(q, t)
        n_inliers = jnp.sum(w_valid.astype(jnp.int32))
        u = quat_rotate(q[None], po)
        r = jnp.einsum("fc,fc->f", u + t[None] - pa, nrm, precision=GEOM)
        a = jnp.abs(r)
        d = cfg.huber_delta
        rho = jnp.where(a <= d, r * r, d * (2.0 * a - d))
        wv = w_valid.astype(r.dtype)
        # mean Huber residual over MATCHED points. (An all-points variant
        # charging gate-dropped points a fixed penalty was tried and is
        # worse: the count term, rho(gate) ~ 0.3, swamps the residual term
        # ~1e-3 and the score degenerates to noisy match-counting. Count
        # gaming is handled by the inlier guard in the pick rule instead.)
        score = jnp.sum(rho * wv) / jnp.maximum(n_inliers, 1)
        # too few constraints: effectively reject this hypothesis (reference
        # skips frames with <10 last-frame planes, cpp:158)
        score = score + jnp.where(n_inliers > 10, 0.0, 1e6)
        return q, t, n_inliers, score

    qs, ts, n_ins, scores = jax.vmap(solve)(init_qs, init_ts)
    # Hypothesis pick — ASYMMETRIC on purpose, because the two anchors have
    # different error processes: warm-start errors are correlated across
    # frames (the anchor is last frame's own estimate — preferring it under
    # ambiguity compounds drift; measured 0.04 -> 1.0 m ATE on a street
    # scene with a tie-prefers-warm rule), while BEV errors are independent
    # per frame (re-measured globally). So BEV is the default, and the warm
    # hypothesis wins only a DECISIVE aliasing event: the two solutions
    # actually disagree (>~ one BEV cell), warm's mean residual is a factor
    # lower (a pose slid one building period leaves O(0.1 m+) residuals on
    # every road-perpendicular plane — measured ~30x separation), and warm
    # did not win by shedding correspondences at the association gate.
    if len(scores) == 1 or cfg.hypothesis_pick == "warm":
        pick = jnp.int32(0)
    elif cfg.hypothesis_pick == "bev":
        pick = jnp.int32(1)
    else:
        separation = jnp.linalg.norm(ts[0] - ts[1])
        decisive = (
            (scores[0] < cfg.hyp_score_factor * scores[1])
            & (separation > cfg.hyp_separation_min)
            & (n_ins[0] >= (0.8 * n_ins[1]).astype(n_ins.dtype))
        )
        pick = jnp.where(decisive, 0, 1)
    q, t, n_inliers = qs[pick], ts[pick], n_ins[pick]
    # guard: no hypothesis had enough constraints -> keep the warm start
    ok = n_inliers > 10
    q = jnp.where(ok, q, init_q)
    t = jnp.where(ok, t, init_t)
    return q, t, n_inliers
