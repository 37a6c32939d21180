"""Keyframe pose-graph mapping back-end.

TPU-native replacement for the mapOptmization ROS node
(src/mapOptmization.cpp): keyframe gating (:128-144), keyframe bookkeeping
(:82-112), loop-closure detection by radius + time separation (:168-198),
submap extraction (:201-223), ICP loop registration (:240-277), pose-graph
optimization (:280-293), pose history correction (:315-332).

TPU-first restructuring: the node's dynamic containers (pcl clouds of
keyposes, std::vector of keyframes, std::map of loop pairs) become
preallocated HBM-resident buffers with write cursors inside a single pytree
``MapState``; the per-event control flow (keyframe? loop candidate? ICP
accepted?) becomes nested ``lax.cond`` so a jitted per-scan step stays a
static graph while only executing the taken branch at runtime.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ssf_slam_tpu.config import MappingConfig
from ssf_slam_tpu.mapping.posegraph import solve_pose_graph
from ssf_slam_tpu.ops.icp import icp_point_to_point
from ssf_slam_tpu.ops.knn import nearest_neighbor
from ssf_slam_tpu.ops.se3 import (
    matrix_to_quat,
    pose_between,
    pose_compose,
    quat_identity,
    quat_normalize,
    quat_rotate,
    quat_to_rpy,
)
from ssf_slam_tpu.ops.buffers import row_write
from ssf_slam_tpu.ops.voxel import voxel_downsample

Array = jax.Array

# Loop-factor buffer size. NOT a hard stop: once full, a newly accepted loop
# REPLACES the lowest-weight (highest-fitness) stored factor iff it is
# stronger — the graph keeps the best MAX_LOOPS factors instead of silently
# ignoring every closure after the 32nd (the round-3 behavior). The reference
# iSAM2 back-end is unbounded (src/mapOptmization.cpp:280-293); the fixed
# buffer is the static-shape tax, replace-weakest is how it pays it.
# MapState.n_loops_total counts every accepted closure so hosts can report
# saturation (cli.py::_run_variant prints the warning).
MAX_LOOPS = 32


class MapState(NamedTuple):
    """All mapping state, preallocated. K = max_keyframes, F = cloud size."""

    kf_q: Array  # [K, 4] optimized keyframe rotations
    kf_t: Array  # [K, 3] optimized keyframe positions
    kf_time: Array  # [K]
    # Cloud buffers are stored TRANSPOSED [K, 3, F]: a [K, F, 3] layout
    # puts 3 in the minor (lane) dimension, which XLA pads to 128 lanes —
    # the buffer physically occupies ~42x its logical size and every
    # keyframe write moves gigabytes (measured 27 ms/frame).
    kf_cloud: Array  # [K, 3, F] feature cloud per keyframe (sensor frame)
    kf_cloud_mask: Array  # [K, F]
    # Strided refine substore (R = F // MappingConfig.refine_stride): TLS
    # normals of every stride-th cloud row, fit once at keyframe creation.
    # The scan-to-map refine target gathers THESE instead of re-fitting
    # planes on the aggregated submap every event (the round-4 design,
    # whose 16k-point TLS fit alone cost 8.5 ms/keyframe on-chip).
    kf_rnorm: Array  # [K, 3, R] stored normals (sensor frame)
    kf_rvalid: Array  # [K, R]
    odom_rel_q: Array  # [K, 4] measured between factor (i-1 -> i)
    odom_rel_t: Array  # [K, 3]
    n_kf: Array  # int32 cursor
    loop_a: Array  # [L] int32
    loop_b: Array  # [L] int32
    loop_rel_q: Array  # [L, 4]
    loop_rel_t: Array  # [L, 3]
    loop_w: Array  # [L] factor weight (0 = unused slot)
    n_loops: Array  # int32 — occupied factor slots (saturates at L)
    n_loops_total: Array  # int32 — every accepted closure, never saturates
    loop_record_index: Array  # int32 — next kf index allowed to loop-detect
    adjust_q: Array  # [4] accumulated loop correction (trans_loop_adjust)
    adjust_t: Array  # [3]
    cur_q: Array  # [4] current optimized map pose (T_map_0_curr)
    cur_t: Array  # [3]


def init_map_state(
    max_keyframes: int, cloud_size: int, dtype=jnp.float32,
    max_loops: int = MAX_LOOPS, refine_stride: int = 4,
) -> MapState:
    k, f, l = max_keyframes, cloud_size, max_loops
    r = max(cloud_size // max(refine_stride, 1), 1)
    qid = quat_identity(dtype)
    return MapState(
        kf_q=jnp.tile(qid, (k, 1)),
        kf_t=jnp.zeros((k, 3), dtype),
        kf_time=jnp.zeros((k,), dtype),
        kf_cloud=jnp.zeros((k, 3, f), dtype),
        kf_cloud_mask=jnp.zeros((k, f), bool),
        kf_rnorm=jnp.zeros((k, 3, r), dtype),
        kf_rvalid=jnp.zeros((k, r), bool),
        odom_rel_q=jnp.tile(qid, (k, 1)),
        odom_rel_t=jnp.zeros((k, 3), dtype),
        n_kf=jnp.int32(0),
        loop_a=jnp.zeros((l,), jnp.int32),
        loop_b=jnp.zeros((l,), jnp.int32),
        loop_rel_q=jnp.tile(qid, (l, 1)),
        loop_rel_t=jnp.zeros((l, 3), dtype),
        loop_w=jnp.zeros((l,), dtype),
        n_loops=jnp.int32(0),
        n_loops_total=jnp.int32(0),
        loop_record_index=jnp.int32(0),
        adjust_q=qid,
        adjust_t=jnp.zeros(3, dtype),
        cur_q=qid,
        cur_t=jnp.zeros(3, dtype),
    )


def _is_keyframe(state: MapState, q, t, cfg: MappingConfig) -> Array:
    """Motion gate vs the previous keyframe (mapOptmization.cpp:128-144)."""
    last = state.n_kf - 1
    rel_q, rel_t = pose_between(
        (state.kf_q[last], state.kf_t[last]), (q, t)
    )
    roll, pitch, yaw = quat_to_rpy(rel_q)
    small = (
        (jnp.abs(roll) < cfg.keyframe_rot_gate)
        & (jnp.abs(pitch) < cfg.keyframe_rot_gate)
        & (jnp.abs(yaw) < cfg.keyframe_rot_gate)
        & (jnp.linalg.norm(rel_t) < cfg.keyframe_trans_gate)
    )
    return (state.n_kf == 0) | ~small


def _detect_loop(state: MapState, idx, q, t, cfg: MappingConfig):
    """Nearest historic keyframe within radius with enough time separation.

    mapOptmization.cpp:168-198: radiusSearch(15 m) sorted by distance, first
    hit with |dt| > 20 s wins.
    """
    k = state.kf_t.shape[0]
    j = jnp.arange(k)
    dist = jnp.linalg.norm(state.kf_t - t[None], axis=-1)
    tgap = jnp.abs(state.kf_time - state.kf_time[idx])
    ok = (
        (j < idx)
        & (dist < cfg.loop_search_radius)
        & (tgap > cfg.loop_time_gap)
    )
    cand = jnp.argmin(jnp.where(ok, dist, jnp.inf)).astype(jnp.int32)
    return jnp.any(ok), cand


def _build_submap(
    state: MapState, center: Array, halfwidth: int, out_points: int,
):
    """Aggregate +-halfwidth keyframe clouds around ``center`` in map frame.

    mapOptmization.cpp:201-223. The reference's 0.1 m ICP voxel filter (:461)
    is deliberately NOT reproduced — see the subsample comment below — so
    there is no voxel-leaf knob here (an earlier one was dead config).
    """
    f = state.kf_cloud.shape[2]
    offs = jnp.arange(-halfwidth, halfwidth + 1)
    ks = center + offs
    valid_k = (ks >= 0) & (ks < state.n_kf)
    ks = jnp.clip(ks, 0, state.kf_cloud.shape[0] - 1)
    clouds = jnp.swapaxes(state.kf_cloud[ks], 1, 2)  # [W, F, 3]
    masks = state.kf_cloud_mask[ks] & valid_k[:, None]
    qs, ts = state.kf_q[ks], state.kf_t[ks]
    world = quat_rotate(qs[:, None, :], clouds) + ts[:, None, :]
    pts = world.reshape(-1, 3)
    mask = masks.reshape(-1)
    # Fixed-budget subsample: COMPACT the valid rows (cumsum scatter, O(n),
    # no sort/top_k — a wide top_k over ~100k rows dominated the whole
    # mapping step's compile time), then stride across the compacted prefix
    # so every selected row is a real point and each keyframe contributes
    # proportionally to its VALID count. Striding the raw buffer instead
    # (round 3) sampled the ~95% padding rows too: a 2048-point submap
    # carried only ~70 live points, silently starving the scan-to-map
    # refinement below its inlier gate. This replaces the PCL 0.1 m ICP
    # voxel filter (:461).
    n = pts.shape[0]
    n_v = jnp.sum(mask.astype(jnp.int32))
    slot = jnp.cumsum(mask.astype(jnp.int32)) - 1
    idx = jnp.where(mask, slot, n)  # invalid rows -> OOB, dropped
    compact = jnp.zeros_like(pts).at[idx].set(pts, mode="drop")
    m = min(out_points, n)
    i = jnp.arange(m, dtype=jnp.int32)
    sel = jnp.where(n_v >= m, (i * n_v) // m, i)
    return compact[sel], i < n_v


def _build_refine_submap(state: MapState, center, halfwidth: int,
                         out_points: int):
    """Refine target: gather +-halfwidth keyframes' STRIDED rows with their
    stored normals, rotate both into the map frame, compact the valid rows
    and stride to a fixed budget (same proportional-subsample scheme as
    ``_build_submap``). Returns (pts [S,3], nrm [S,3], mask [S])."""
    k_buf, _, r = state.kf_rnorm.shape
    f = state.kf_cloud.shape[2]
    stride = max(f // r, 1)
    offs = jnp.arange(-halfwidth, halfwidth + 1)
    ks = center + offs
    valid_k = (ks >= 0) & (ks < state.n_kf)
    ks = jnp.clip(ks, 0, k_buf - 1)
    clouds = jnp.swapaxes(state.kf_cloud[ks, :, ::stride][:, :, :r], 1, 2)
    nrms = jnp.swapaxes(state.kf_rnorm[ks], 1, 2)  # [W, R, 3]
    masks = (state.kf_cloud_mask[ks, ::stride][:, :r]
             & state.kf_rvalid[ks] & valid_k[:, None])
    qs, ts = state.kf_q[ks], state.kf_t[ks]
    pts = (quat_rotate(qs[:, None, :], clouds) + ts[:, None, :]).reshape(-1, 3)
    nrm = quat_rotate(qs[:, None, :], nrms).reshape(-1, 3)
    mask = masks.reshape(-1)
    n = pts.shape[0]
    n_v = jnp.sum(mask.astype(jnp.int32))
    slot = jnp.cumsum(mask.astype(jnp.int32)) - 1
    idx = jnp.where(mask, slot, n)
    both = jnp.concatenate([pts, nrm], axis=-1)
    compact = jnp.zeros_like(both).at[idx].set(both, mode="drop")
    m = min(out_points, n)
    i = jnp.arange(m, dtype=jnp.int32)
    sel = jnp.where(n_v >= m, (i * n_v) // m, i)
    picked = compact[sel]
    return picked[:, :3], picked[:, 3:], i < n_v


def _register_to_submap(src_xyz, src_mask, tgt, tgt_nrm, tgt_mask,
                        q0, t0, cfg: MappingConfig):
    """Point-to-plane GN of the strided source rows against the refine
    submap: ONE association at the incoming (odometry-accurate, cm-level)
    pose, then ``refine_gn_iters`` Huber-IRLS steps with a prior anchored at
    (q0, t0) and per-step clamps. The round-4 version re-ran the full
    odometry solver here (2 re-association passes + hypothesis scoring);
    with a metric init the association barely moves across <=0.2 m steps,
    so a single pass keeps the accuracy at a third of the cost.

    Returns (q, t, n_inliers)."""
    from ssf_slam_tpu.odometry.scan2scan import _huber_weight
    from ssf_slam_tpu.ops.knn import knn
    from ssf_slam_tpu.ops.precision import GEOM
    from ssf_slam_tpu.ops.se3 import (
        quat_conjugate,
        quat_multiply,
        quat_normalize,
        so3_exp_quat,
        so3_log_quat,
    )

    warped = quat_rotate(q0[None], src_xyz) + t0[None]
    # no re-rank: the association only thresholds d and a near-tie neighbor
    # swap changes one correspondence among ~1024 (ops/knn.py rerank note)
    d, j = knn(warped, tgt, 1, points_mask=tgt_mask, approx=True,
               rerank=False)
    j, d = j[:, 0], d[:, 0]
    pa, na = tgt[j], tgt_nrm[j]
    w_valid = src_mask & tgt_mask[j] & (d < cfg.refine_max_corr_dist**2)
    n_in = jnp.sum(w_valid.astype(jnp.int32))
    w_prior = jnp.concatenate([
        jnp.full((3,), cfg.refine_prior_rot),
        jnp.full((3,), cfg.refine_prior_trans),
    ])

    def gn(_, carry):
        q, t = carry
        u = quat_rotate(q[None], src_xyz)
        r = jnp.einsum("fc,fc->f", u + t[None] - pa, na, precision=GEOM)
        w = _huber_weight(r, cfg.refine_huber) * w_valid.astype(r.dtype)
        jac = jnp.concatenate([jnp.cross(u, na), na], axis=-1)  # [R, 6]
        h = jnp.einsum("fi,fj->ij", jac * w[:, None], jac, precision=GEOM)
        g = jnp.einsum("fi,f->i", jac, w * r, precision=GEOM)
        r_prior = jnp.concatenate([
            so3_log_quat(quat_multiply(q, quat_conjugate(q0))), t - t0,
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
        return q, t + delta[3:]

    q, t = jax.lax.fori_loop(0, cfg.refine_gn_iters, gn, (q0, t0))
    return q, t, n_in


def _refine_to_submap(
    state: MapState, q, t, src_xyz, src_mask, cfg: MappingConfig,
):
    """Scan-to-map refinement of the incoming keyframe (scan-to-map stage;
    the reference has none — mapOptmization.cpp:450 uses raw integrated
    odometry between loop events). ``src_xyz``/``src_mask`` are the STRIDED
    rows of the incoming cloud. Returns (q_ref, t_ref, corr_q, corr_t,
    accepted)."""
    from ssf_slam_tpu.ops.se3 import pose_inverse, so3_log_quat

    # window = the last (halfwidth+1 .. 2*halfwidth+1) keyframes, clipped at
    # the sequence start by the builder's validity mask
    center = state.n_kf - 1 - cfg.refine_halfwidth
    tgt, tgt_nrm, tgt_mask = _build_refine_submap(
        state, center, cfg.refine_halfwidth, cfg.refine_submap_points
    )
    q2, t2, n_in = _register_to_submap(
        src_xyz, src_mask, tgt, tgt_nrm, tgt_mask, q, t, cfg
    )
    # left correction in the map frame: refined = corr o raw
    corr_q, corr_t = pose_compose((q2, t2), pose_inverse((q, t)))
    accept = (
        (n_in >= cfg.refine_min_inliers)
        & (jnp.linalg.norm(corr_t) < cfg.refine_max_trans)
        & (jnp.linalg.norm(so3_log_quat(corr_q)) < cfg.refine_max_rot)
    )
    qid = quat_identity(corr_q.dtype)
    q_ref = jnp.where(accept, q2, q)
    t_ref = jnp.where(accept, t2, t)
    corr_q = jnp.where(accept, corr_q, qid)
    corr_t = jnp.where(accept, corr_t, jnp.zeros_like(corr_t))
    return q_ref, t_ref, corr_q, corr_t, accept


def _try_close_loop(state: MapState, idx, cfg: MappingConfig):
    """ICP the current keyframe against the candidate submap; on success
    append a loop factor and run the batch pose-graph solve."""
    found, cand = _detect_loop(state, idx, state.kf_q[idx], state.kf_t[idx], cfg)
    # detection attempt consumes the 2-frame skip (mapOptmization.cpp:196)
    state = state._replace(
        loop_record_index=jnp.where(
            found, idx + cfg.loop_skip_after_detect, state.loop_record_index
        )
    )

    def attempt(state):
        src = quat_rotate(state.kf_q[idx][None], state.kf_cloud[idx].T) + state.kf_t[idx][None]
        src_mask = state.kf_cloud_mask[idx]
        tgt, tgt_mask = _build_submap(
            state, cand, cfg.loop_submap_halfwidth, cfg.submap_points,
        )
        r, t_corr, fitness = icp_point_to_point(
            src, tgt, src_mask, tgt_mask,
            max_corr_dist=cfg.icp_max_corr_dist, iters=cfg.icp_iters,
        )
        # pre-alignment fitness at the current (drifted) pose: the relative
        # accept rule needs it (see MappingConfig.icp_rel_improve)
        d2_pre, _ = nearest_neighbor(src, tgt, points_mask=tgt_mask,
                                     approx=True)
        w_pre = (src_mask
                 & (d2_pre < cfg.icp_max_corr_dist ** 2)).astype(src.dtype)
        fitness_pre = jnp.sum(d2_pre * w_pre) / jnp.maximum(
            jnp.sum(w_pre), 1.0)
        accept = (fitness < cfg.icp_fitness_gate) | (
            fitness < cfg.icp_rel_improve * fitness_pre)
        # Correction-magnitude sanity gate: the candidate was detected
        # within loop_search_radius of the (drifted) pose, so a legitimate
        # closure cannot move the pose much beyond that radius. Without
        # this, a ground-plane-dominated scene lets a wildly slid ICP
        # alignment (ground slides along itself freely) pass the absolute
        # fitness gate and inject a multi-meter garbage factor (observed:
        # an 11 m rel_t factor at fitness 0.58 warped the whole graph).
        corr_disp = (jnp.einsum("ab,b->a", r, state.kf_t[idx]) + t_corr
                     - state.kf_t[idx])
        accept = accept & (
            jnp.linalg.norm(corr_disp) < 1.5 * cfg.loop_search_radius)
        # buffer-full policy: a new factor must beat the weakest stored one
        # to enter (keep-best, never silent-drop — see MAX_LOOPS note)
        l_cap = state.loop_w.shape[0]
        w = 1.0 / jnp.maximum(fitness, 1e-6)
        saturated = state.n_loops >= l_cap
        weakest = jnp.argmin(state.loop_w).astype(jnp.int32)
        accept = accept & (~saturated | (w > state.loop_w[weakest]))

        def close(state):
            corr = (matrix_to_quat(r), t_corr)
            pose_cur = (state.kf_q[idx], state.kf_t[idx])
            pose_corrected = pose_compose(corr, pose_cur)  # tCorrect (:260)
            pose_pre = (state.kf_q[cand], state.kf_t[cand])
            rel_q, rel_t = pose_between(pose_corrected, pose_pre)
            li = jnp.where(saturated, weakest,
                           jnp.minimum(state.n_loops, l_cap - 1))
            # trans_loop_adjust accumulates the ICP correction (:327,450).
            # NORMALIZE the accumulated rotation: the adjust quaternion is
            # the one state that compounds multiplicatively forever, and a
            # correction built as q2 o conj(q) carries |q| = |adjust| — so
            # any epsilon of off-unit norm SQUARES per fold ((1+1e-7)^(2^k)
            # explodes past ~20 events; observed |adjust_q| = 3.2 by
            # keyframe 27, which scales every subsequent pose by |q|^2).
            adj_q, adj_t = pose_compose(corr, (state.adjust_q, state.adjust_t))
            adj_q = quat_normalize(adj_q)
            state = state._replace(
                loop_a=row_write(state.loop_a, li, idx),
                loop_b=row_write(state.loop_b, li, cand),
                loop_rel_q=row_write(state.loop_rel_q, li, rel_q),
                loop_rel_t=row_write(state.loop_rel_t, li, rel_t),
                loop_w=row_write(state.loop_w, li, w),
                n_loops=jnp.minimum(state.n_loops + 1, l_cap),
                n_loops_total=state.n_loops_total + 1,
                loop_record_index=state.loop_record_index
                + cfg.loop_skip_after_close,
                adjust_q=adj_q,
                adjust_t=adj_t,
            )
            # batch GN over the whole graph (replaces iSAM2 update storm :280-293)
            active = jnp.arange(state.kf_q.shape[0]) < state.n_kf
            new_q, new_t = solve_pose_graph(
                state.kf_q, state.kf_t, active,
                state.odom_rel_q, state.odom_rel_t,
                state.loop_a, state.loop_b,
                state.loop_rel_q, state.loop_rel_t, state.loop_w,
                odom_w_rot=1.0 / cfg.odom_rot_var,
                odom_w_trans=1.0 / cfg.odom_trans_var,
                iters=cfg.posegraph_gn_iters,
            )
            return state._replace(kf_q=new_q, kf_t=new_t)

        return jax.lax.cond(accept, close, lambda s: s, state)

    return jax.lax.cond(found, attempt, lambda s: s, state)


@functools.partial(jax.jit, static_argnames=("cfg",))
def mapping_step(
    state: MapState,
    odom_q: Array,
    odom_t: Array,
    cloud_xyz: Array,
    cloud_mask: Array,
    time: Array,
    cfg: MappingConfig = MappingConfig(),
    cloud_planes=None,
) -> tuple[MapState, dict]:
    """Process one odometry frame + feature cloud.

    Args mirror the node's two subscriptions (/frame_odom2 +
    /plane_frame_cloud2, mapOptmization.cpp:473-474); returns the new state
    and {pose_q, pose_t, is_keyframe} (the /map_odom_res3 output, which also
    feeds the TUM trajectory writer :353-374).

    ``cloud_planes`` (optional PlaneModel of ``cloud_xyz`` in the sensor
    frame): when ``cfg.scan_to_map_refine``, each new keyframe is
    scan-to-map refined against the recent submap before being recorded
    (see _refine_to_submap), and its strided normals enter the refine
    substore for future submap targets. When ``cloud_planes`` is given
    (ONLY_PC / geom-refine paths, which compute ring-diverse planes
    anyway), its strided rows are stored for free; otherwise TLS normals
    are fit on the strided rows INSIDE the keyframe-event branch
    (odometry/scan2map.py::fit_local_planes), so flow variants pay nothing
    on non-keyframe scans. ALL variants participate since round 4
    (MappingConfig.scan_to_map_refine default-on).
    """
    # loop-corrected map pose (T_map_0_curr = trans_loop_adjust * T_fodom, :450)
    q, t = pose_compose((state.adjust_q, state.adjust_t), (odom_q, odom_t))
    is_kf = _is_keyframe(state, q, t, cfg)
    r = state.kf_rnorm.shape[2]
    stride = max(cloud_xyz.shape[0] // r, 1)
    src_xyz = cloud_xyz[::stride][:r]
    src_mask = cloud_mask[::stride][:r]

    def add_keyframe(state):
        idx = state.n_kf
        if cfg.scan_to_map_refine:
            if cloud_planes is not None:
                src_nrm = cloud_planes.normal[::stride][:r]
                src_nvalid = cloud_planes.valid[::stride][:r]
            else:
                from ssf_slam_tpu.odometry.scan2map import fit_local_planes

                pl = fit_local_planes(src_xyz, src_mask)
                src_nrm, src_nvalid = pl.normal, pl.valid

            def do_refine(state):
                qr, tr, cq, ct, _ = _refine_to_submap(
                    state, q, t, src_xyz, src_mask, cfg
                )
                # fold into the running adjust so every subsequent (non-
                # keyframe) pose inherits the correction, exactly like the
                # loop-closure trans_loop_adjust (:327,450)
                adj_q, adj_t = pose_compose(
                    (cq, ct), (state.adjust_q, state.adjust_t)
                )
                # see the loop-closure fold: the adjust norm squares per
                # fold without this
                adj_q = quat_normalize(adj_q)
                return state._replace(adjust_q=adj_q, adjust_t=adj_t), qr, tr

            state, qk, tk = jax.lax.cond(
                idx >= cfg.refine_min_keyframes,
                do_refine,
                lambda s: (s, q, t),
                state,
            )
        else:
            qk, tk = q, t
            src_nrm = jnp.zeros((r, 3), cloud_xyz.dtype)
            src_nvalid = jnp.zeros((r,), bool)
        prev = jnp.maximum(idx - 1, 0)
        rel_q, rel_t = pose_between(
            (state.kf_q[prev], state.kf_t[prev]), (qk, tk)
        )
        state = state._replace(
            kf_q=row_write(state.kf_q, idx, qk),
            kf_t=row_write(state.kf_t, idx, tk),
            kf_time=row_write(state.kf_time, idx, time),
            kf_cloud=row_write(state.kf_cloud, idx, cloud_xyz.T),
            kf_cloud_mask=row_write(state.kf_cloud_mask, idx, cloud_mask),
            kf_rnorm=row_write(state.kf_rnorm, idx, src_nrm.T),
            kf_rvalid=row_write(state.kf_rvalid, idx, src_nvalid & src_mask),
            odom_rel_q=row_write(state.odom_rel_q, idx, rel_q),
            odom_rel_t=row_write(state.odom_rel_t, idx, rel_t),
            n_kf=idx + 1,
        )
        if cfg.enable_loop_closure:
            may_loop = (
                (state.n_kf >= cfg.loop_min_keyframes)
                & (idx > state.loop_record_index)
            )
            state = jax.lax.cond(
                may_loop, lambda s: _try_close_loop(s, idx, cfg),
                lambda s: s, state,
            )
        # current pose = this keyframe's (possibly re-optimized) pose
        return state._replace(
            cur_q=state.kf_q[idx], cur_t=state.kf_t[idx]
        )

    state = jax.lax.cond(is_kf, add_keyframe,
                         lambda s: s._replace(cur_q=q, cur_t=t), state)
    outputs = dict(pose_q=state.cur_q, pose_t=state.cur_t, is_keyframe=is_kf)
    return state, outputs
