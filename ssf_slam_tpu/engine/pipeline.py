"""The fused SLAM engine: one pure jitted step, scanned over a sequence.

This module is the repo-wide inversion of the reference's architecture: the
five-process ROS pipeline (Python front-end -> frameFeature -> lidarOdometry
-> mapOptmization connected by TCPROS topics, launch/run_Seg.launch:8-20)
becomes ONE pure function ``slam_step(state, scan) -> (state, outputs)``:

    features -> (flow ego-motion | geometric registration) -> pose
    integration -> keyframe mapping (+ loop closure)

``lax.scan`` runs it over a preloaded sequence; ``vmap``/``shard_map`` (see
parallel/) batch it across sequences. Topic queues, mutexes, and dual-rate
polling threads (src/lidarOdometry.cpp:176-206) have no equivalent — state is
a pytree threaded through the scan carry.

Variant dispatch (the launch-file matrix, SURVEY §1):
- ONLY_PC: geometric scan-to-scan GN on planar features
- SEG:     GT mask + provided flow -> Kabsch
- NO_SEG:  GMM split on provided flow -> Kabsch
- SF/SSF:  identical to NO_SEG/SEG but ``scan["flow"]`` comes from the TFlow
  network (and ``scan["static_mask"]`` from the seg head); the engine takes
  flow as data, so the network runs fused in the same jit via ``flow_fn``.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssf_slam_tpu.config import PipelineConfig, Variant
from ssf_slam_tpu.frontend.features import FeatureCloud, extract_plane_features
from ssf_slam_tpu.mapping.keyframes import MapState, init_map_state, mapping_step
from ssf_slam_tpu.odometry.egomotion import (
    ego_motion_from_flow,
    ego_motion_gmm,
    ego_motion_gt_seg,
    trim_static_mask,
)
from ssf_slam_tpu.odometry.flow_refine import refine_flow_pose
from ssf_slam_tpu.odometry.scan2scan import (
    PlaneModel,
    fit_ring_diverse_planes,
    scan_to_scan,
)
from ssf_slam_tpu.ops.se3 import pose_compose, quat_identity, quat_normalize

Array = jax.Array


class SlamState(NamedTuple):
    """Carry of the per-scan step."""

    last_feat: FeatureCloud
    last_planes: PlaneModel
    have_last: Array  # bool — first-frame gate (flagStart, lidarOdometry.cpp:301)
    odom_q: Array  # [4] integrated frame odometry (q_0_curr)
    odom_t: Array  # [3]
    vel_q: Array  # [4] last frame-to-frame motion — warm start
    vel_t: Array  # [3]
    map_state: MapState


def init_slam_state(cfg: PipelineConfig) -> SlamState:
    f = cfg.features.max_features
    # the odometry target is a local map of the last N feature clouds
    # (OdometryConfig.local_map_scans), kept in the latest scan's frame
    m = f * (cfg.odometry.local_map_scans if cfg.variant == Variant.ONLY_PC else 1)
    qid = quat_identity()
    feat = FeatureCloud(
        xyz=jnp.zeros((m, 3), jnp.float32),
        ring=jnp.zeros((m,), jnp.int32),
        mask=jnp.zeros((m,), bool),
    )
    planes = PlaneModel(
        normal=jnp.zeros((m, 3), jnp.float32), valid=jnp.zeros((m,), bool)
    )
    return SlamState(
        last_feat=feat,
        last_planes=planes,
        have_last=jnp.bool_(False),
        odom_q=qid,
        odom_t=jnp.zeros(3),
        vel_q=qid,
        vel_t=jnp.zeros(3),
        map_state=init_map_state(cfg.mapping.max_keyframes, f,
                                 refine_stride=cfg.mapping.refine_stride),
    )


def _frame_motion(state: SlamState, scan: dict, feat: FeatureCloud,
                  feat_planes: PlaneModel, cfg: PipelineConfig):
    """Frame-to-frame transform T_last_curr by variant.

    Flow variants additionally return the [N] static mask over
    ``scan["flow_points"]`` (the variant's own segmentation verdict) — the
    mapping boundary seg-gates keyframe clouds with it (see slam_step).
    Geometry anchors (refine_flow_pose sources) use a residual-TRIMMED copy
    instead: a leaked mover that merely votes in the Kabsch average is
    tolerable, one that anchors a registration is not
    (odometry/egomotion.py::trim_static_mask).
    """
    variant = cfg.variant
    if variant == Variant.ONLY_PC:
        q, t, _ = scan_to_scan(
            feat, state.last_feat, state.last_planes,
            state.vel_q, state.vel_t, cfg.odometry,
            curr_planes=feat_planes,
        )
        return q, t
    # Flow ego-motion uses the PREVIOUS pair's (points, flow): the pair
    # (k-1, k) yields the motion whose timestamp is k. The reference
    # publishes pair k's motion AT frame k (PointCloudOdometry.py:96-103),
    # i.e. the k->k+1 motion consumed as k-1->k — a one-frame lag that
    # vanishes on straight slow paths but breaks curved trajectories.
    pts, mask = scan["flow_points"], scan["flow_mask"]
    flow = scan["flow"]
    if variant == Variant.SEG:
        q, t = ego_motion_gt_seg(pts, flow, scan["fg_mask"], mask)
        return q, t, (scan["fg_mask"] < 0.5) & mask
    if variant in (Variant.NO_SEG, Variant.SF):
        q, t, bg = ego_motion_gmm(pts, flow, mask, cfg.egomotion)
        static = bg & mask
        if variant == Variant.SF and cfg.egomotion.geom_refine:
            anchor = trim_static_mask(pts, flow, static, q, t,
                                      cfg.egomotion.refine_trim_resid)
            q, t = refine_flow_pose(pts, anchor, feat, feat_planes,
                                    q, t, cfg.egomotion)
        return q, t, static
    if variant == Variant.SSF:
        static = scan["static_mask"] & mask
        q, t = ego_motion_from_flow(pts, flow, static,
                                    irls_iters=cfg.egomotion.irls_iters,
                                    irls_sigma=cfg.egomotion.irls_sigma)
        if cfg.egomotion.geom_refine:
            anchor = trim_static_mask(pts, flow, static, q, t,
                                      cfg.egomotion.refine_trim_resid)
            q, t = refine_flow_pose(pts, anchor, feat, feat_planes,
                                    q, t, cfg.egomotion)
        return q, t, static
    raise ValueError(variant)


_DYN_BUDGET = 1024  # compacted mover-point budget for the keyframe seg-gate


def _near_dynamic(feat_xyz: Array, warped: Array, dyn: Array,
                  radius: float) -> Array:
    """[F] bool: feature points within ``radius`` of any dynamic point.

    The full kNN engine is overkill here (k=1, radius test only, and movers
    are a small fraction of the scan): compact the dynamic points to a
    fixed budget with a cumsum scatter, then a single [F, B] masked
    min-distance whose cross term rides the MXU. Measured: the naive
    nearest_neighbor formulation cost the whole bench ~8 scans/s; this one
    is noise-level. Points past the budget are dropped — the gate is a
    clearance heuristic, not an exact classifier, and >1024 mover points
    implies a mover bloc the radius already blankets.
    """
    slot = jnp.cumsum(dyn.astype(jnp.int32)) - 1
    idx = jnp.where(dyn & (slot < _DYN_BUDGET), slot, _DYN_BUDGET)
    compact = jnp.full((_DYN_BUDGET + 1, 3), 1e6, warped.dtype)
    compact = compact.at[idx].set(warped, mode="drop")[:_DYN_BUDGET]
    d2 = (
        jnp.sum(feat_xyz * feat_xyz, axis=-1, keepdims=True)
        - 2.0 * (feat_xyz @ compact.T)
        + jnp.sum(compact * compact, axis=-1)[None, :]
    )
    return jnp.any(dyn) & (jnp.min(d2, axis=-1) < radius * radius)


@functools.partial(jax.jit, static_argnames=("cfg",))
def slam_step(
    state: SlamState, scan: dict, cfg: PipelineConfig
) -> tuple[SlamState, dict]:
    """Process one scan.

    ``scan``: {points [N,3], mask [N], time scalar} plus per-variant extras
    (flow, fg_mask, static_mask). Returns (state, outputs) with the map-
    optimized pose, the raw odometry pose, and the keyframe flag.
    """
    feat = extract_plane_features(
        scan["points"], scan["mask"], cfg.lidar, cfg.features
    )
    flow_variant = cfg.variant is not Variant.ONLY_PC
    if cfg.variant == Variant.ONLY_PC or (
        flow_variant and cfg.egomotion.geom_refine
    ):
        # geom_refine needs the current scan's planes as the refinement
        # target (odometry/flow_refine.py); ONLY_PC needs them for the
        # odometry itself. Flow variants WITHOUT geom_refine fit nothing
        # here — the scan-to-map refine's normals are fit on strided rows
        # inside the keyframe-event branch (mapping/keyframes.py), so the
        # per-scan cost of MappingConfig.scan_to_map_refine is zero (the
        # round-4 per-scan ring fit alone cost 3.8 ms/scan on-chip and
        # was the headline-bench regression, 112.9 -> 41.2 scans/s).
        curr_planes = fit_ring_diverse_planes(feat, cfg.odometry)
    else:
        curr_planes = None

    def with_motion(state):
        return _frame_motion(state, scan, feat, curr_planes, cfg)

    def identity_motion(state):
        if flow_variant:
            # no pair data yet: everything counts as static for the map gate
            return (quat_identity(), jnp.zeros(3),
                    jnp.ones_like(scan["flow_mask"]))
        return quat_identity(), jnp.zeros(3)

    # first frame: no relative motion (flagStart, lidarOdometry.cpp:301-303).
    # NOTE: flow variants could compute motion on frame 0 too (flow is
    # intrinsic to the pair), but the reference front-ends publish from the
    # first file onward while the C++ side skips frame 0 — net effect
    # identical: integration starts at identity.
    motion = jax.lax.cond(state.have_last, with_motion, identity_motion, state)
    rel_q, rel_t = motion[0], motion[1]

    # Seg-gate the keyframe cloud (MappingConfig.seg_gate_keyframes): the
    # flow pair's dynamic points advected by their own flow land in the
    # CURRENT frame's coordinates (the flow convention — pts+flow lives in
    # frame 2; odometry/egomotion.py docstring), directly comparable to
    # feat.xyz. Features within seg_gate_radius of any warped mover are
    # dropped from the STORED cloud only — odometry still sees the full
    # feature set. The reference stores raw clouds (mapOptmization.cpp:
    # 201-223); this is the designed-but-unbuilt piece the round-3 verdict
    # named (its measured cost: scan-to-map refine latched mover blocs,
    # 0.04 -> 0.52 m, and had to ship disabled).
    kf_mask = feat.mask
    n_dyn_over = jnp.int32(0)
    if flow_variant and cfg.mapping.seg_gate_keyframes:
        warped = scan["flow_points"] + scan["flow"]
        # Gate with the residual-TRIMMED static mask, not the raw variant
        # verdict: false-statics the segmentation missed but whose flow
        # disagrees with the fitted rigid motion are exactly the leaks
        # trim_static_mask exists to catch, and a leaked mover in the
        # stored keyframe cloud anchors the scan-to-map refine target.
        static_trim = trim_static_mask(
            scan["flow_points"], scan["flow"], motion[2], rel_q, rel_t,
            cfg.egomotion.refine_trim_resid,
        )
        dyn = scan["flow_mask"] & ~static_trim
        near_dyn = _near_dynamic(feat.xyz, warped, dyn,
                                 cfg.mapping.seg_gate_radius)
        kf_mask = feat.mask & ~near_dyn
        # movers past the compaction budget lose gate coverage — surface
        # the overflow so hosts can warn (cli.py), instead of truncating
        # silently (round-4 advisor finding)
        n_dyn_over = jnp.maximum(
            jnp.sum(dyn.astype(jnp.int32)) - _DYN_BUDGET, 0
        )

    # integrate: q_0_curr = q_0_last * q_last_curr (lidarOdometry.cpp:87-88).
    # Renormalized: the integrated quaternion accumulates fp norm drift
    # linearly over thousands of scans (and the mapping adjust chain, which
    # composes against it, amplifies any off-unit norm multiplicatively —
    # see mapping/keyframes.py).
    odom_q, odom_t = pose_compose((state.odom_q, state.odom_t), (rel_q, rel_t))
    odom_q = quat_normalize(odom_q)

    map_state, map_out = mapping_step(
        state.map_state, odom_q, odom_t, feat.xyz, kf_mask,
        scan["time"], cfg.mapping, cloud_planes=curr_planes,
    )

    # update the odometry local map (sliding window of the last N feature
    # clouds, expressed in the CURRENT scan's frame)
    if cfg.variant == Variant.ONLY_PC:
        from ssf_slam_tpu.ops.se3 import quat_conjugate, quat_rotate

        f = cfg.features.max_features
        inv_q = quat_conjugate(rel_q)
        old_xyz = quat_rotate(inv_q[None], state.last_feat.xyz - rel_t[None])
        new_feat = FeatureCloud(
            xyz=jnp.concatenate([old_xyz[f:], feat.xyz]),
            ring=jnp.concatenate([state.last_feat.ring[f:], feat.ring]),
            mask=jnp.concatenate([state.last_feat.mask[f:], feat.mask]),
        )
        new_planes = fit_ring_diverse_planes(new_feat, cfg.odometry)
    else:
        new_feat = feat
        new_planes = state.last_planes

    new_state = SlamState(
        last_feat=new_feat,
        last_planes=new_planes,
        have_last=jnp.bool_(True),
        odom_q=odom_q,
        odom_t=odom_t,
        vel_q=rel_q,
        vel_t=rel_t,
        map_state=map_state,
    )
    outputs = dict(
        pose_q=map_out["pose_q"],
        pose_t=map_out["pose_t"],
        odom_q=odom_q,
        odom_t=odom_t,
        rel_q=rel_q,
        rel_t=rel_t,
        is_keyframe=map_out["is_keyframe"],
        n_features=jnp.sum(feat.mask.astype(jnp.int32)),
        n_dyn_over=n_dyn_over,
    )
    return new_state, outputs


@functools.partial(jax.jit, static_argnames=("cfg",))
def run_sequence_scan(state: SlamState, scans: dict, cfg: PipelineConfig):
    """lax.scan the step over stacked scans (leading axis = frames)."""
    def body(carry, scan):
        return slam_step(carry, scan, cfg)

    return jax.lax.scan(body, state, scans)


def stack_scans(frames: list, cfg: PipelineConfig,
                flow_key: Optional[str] = None) -> dict:
    """Host-side: stack frame dicts (data/synthetic.py schema) into arrays.

    flow_key selects which flow feeds the ego-motion ('gt' for Seg/noSeg
    ground-truth configs, or a key holding predicted flow).
    """
    n = cfg.lidar.max_points

    def shifted(key, dtype=np.float32):
        """Frame k carries pair (k-1)'s data (see _frame_motion); row 0 zeros."""
        arr = np.stack([frames[max(k - 1, 0)][key][:n] for k in
                        range(len(frames))])
        arr[0] = 0
        return arr.astype(dtype)

    out = dict(
        points=np.stack([f["pos1"][:n] for f in frames]).astype(np.float32),
        mask=np.stack([f["mask1"][:n].astype(bool) for f in frames]),
        time=np.asarray([f["time"] for f in frames], np.float32),
    )
    if cfg.variant != Variant.ONLY_PC:
        out["flow_points"] = shifted("pos1")
        out["flow_mask"] = shifted("mask1", bool)
        key = flow_key or "gt"
        out["flow"] = shifted(key)
    if cfg.variant == Variant.SEG:
        out["fg_mask"] = shifted("s_fg_mask")
    if cfg.variant == Variant.SSF:
        out["static_mask"] = shifted("static_mask", bool)
    return {k: jnp.asarray(v) for k, v in out.items()}


def run_sequence(frames: list, cfg: PipelineConfig,
                 flow_key: Optional[str] = None):
    """End-to-end: frames -> trajectory dict (host convenience wrapper)."""
    scans = stack_scans(frames, cfg, flow_key)
    state = init_slam_state(cfg)
    state, outs = run_sequence_scan(state, scans, cfg)
    return state, {k: np.asarray(v) for k, v in outs.items()}
