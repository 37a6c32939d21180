"""Typed configuration for the whole framework.

The reference spreads configuration over four mechanisms (argparse, roslaunch
params, YAML->EasyDict, and module-level feature-flag globals in
utils/datasets/carla.py:8-10). Here everything is one tree of frozen
dataclasses; a pipeline variant is a config value, not an import-time flag.

Reference anchors (for parity checks):
- N_SCAN_ROW / per-LiDAR thresholds: include/header.h:37, src/frameFeature.cpp:141-153
- odometry solver budget:            src/lidarOdometry_onlyPC.cpp:160,243-249
- keyframe / loop-closure gates:     src/mapOptmization.cpp:128-144,168-198,240-251
- model operating point:             scripts/ActiveSceneFlow/main_sju_occ_ros.py:507,514
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Tuple


class Variant(enum.Enum):
    """The five pipeline variants (launch-file equivalents).

    Mirrors the capability matrix in launch/*.launch:
    - ONLY_PC: pure geometric LOAM (run_onlyPC.launch)
    - SEG:     GT semantics gate static points, GT flow ego-motion (run_Seg.launch)
    - NO_SEG:  GT flow + GMM background split (run_noSeg.launch)
    - SF:      predicted flow + GMM split (run_noSeg_ActiveSceneFlow.launch)
    - SSF:     predicted flow + learned segmentation (run_Pointnet2Seg_*.launch)
    """

    ONLY_PC = "onlypc"
    SEG = "seg"
    NO_SEG = "noseg"
    SF = "sf"
    SSF = "ssf"


@dataclasses.dataclass(frozen=True)
class LidarConfig:
    """Scan geometry. Reference: include/header.h:37, src/frameFeature.cpp:57-71."""

    n_scan_rows: int = 16
    # elevation model: 16-row velodyne rows span [-15, +15] deg at 2 deg pitch
    vertical_fov_deg: Tuple[float, float] = (-15.0, 15.0)
    max_points: int = 8192  # padded scan size (N); validity mask marks real points


@dataclasses.dataclass(frozen=True)
class FeatureConfig:
    """Planar feature extraction. Reference: src/frameFeature.cpp:84-153."""

    curvature_halfwin: int = 5  # 11-point curvature window (j-5 .. j+5)
    plane_curv_max_16: float = 0.05  # planeMin for 16-row (frameFeature.cpp:144)
    plane_curv_max_64: float = 0.005  # for 64-row (frameFeature.cpp:148)
    plane_stride_16: int = 3  # planeSpan thinning stride (frameFeature.cpp:145)
    plane_stride_64: int = 25
    row_margin_64: int = 5  # rowIndexStart/End for 64-row (frameFeature.cpp:150-151)
    voxel_leaf: float = 0.2  # downSizeFilterPlane leaf (frameFeature.cpp:153)
    max_features: int = 4096  # padded feature-cloud size


@dataclasses.dataclass(frozen=True)
class OdometryConfig:
    """Scan-to-scan registration. Reference: src/lidarOdometry_onlyPC.cpp."""

    outer_iters: int = 2  # re-association passes (lidarOdometry_onlyPC.cpp:160)
    gn_iters: int = 8  # Ceres max_num_iterations equivalent (:246)
    # Normal-compatible association (upgrade over the reference's bare 1-NN
    # seed, cpp:168): candidates per query and the score penalty (m^2 of
    # squared distance added at full normal incompatibility).
    assoc_neighbors: int = 8
    assoc_normal_penalty: float = 2.0
    assoc_max_dist: float = 1.5  # drop correspondences farther than this (m)
    # Solver stabilization (no reference equivalent; Ceres' internal trust
    # region played this role): range-noise scale r0 (sigma grows as
    # 1+(r/r0)^2), Levenberg damping, and per-iteration step clamps.
    range_sigma_scale: float = 30.0
    lm_lambda: float = 1e-3
    max_rot_step: float = 0.05
    max_trans_step: float = 0.5
    # Global BEV-correlation translation init per frame (odometry/bev_init.py)
    bev_init: bool = True
    # Hypothesis selection for the dual-anchor solve (scan_to_scan): "bev"
    # (default) always takes the BEV-anchored solution; "score" picks by
    # final point-to-plane residual; "warm" forces the constant-velocity
    # anchor. "bev" is the default because residual arbitration measurably
    # CANNOT be made safe in dynamic scenes: a warm-anchored solve that
    # latches onto a coherent mover bloc produces a self-consistent,
    # genuinely LOWER-residual wrong pose (measured 0.04 -> 0.52 m ATE on a
    # mover scene even requiring a 2x score margin + inlier-count guard;
    # re-measured round 4 as 0.088 -> 1.31 m on a 6-slow-mover street for a
    # dynamics-gated variant of the same idea), while the corridor-aliasing
    # failure BEV suffers is handled INSIDE the correlation by the
    # dynamics-windowed peak pick below. BEV's errors are per-frame
    # independent (re-measured against the local map each frame), which
    # bounds mover drag; warm errors compound. See
    # tests/test_engine.py::test_onlypc_tracks_trajectory.
    hypothesis_pick: str = "bev"
    # BEV plausibility window (odometry/bev_init.py): when the global
    # correlation argmax deviates from the constant-velocity prediction by
    # more than bev_plaus_gate in ONE frame (0.4 m at 10 Hz = 40 m/s^2,
    # beyond any road vehicle — i.e. a building-period alias) while a peak
    # within the window scores >= bev_plaus_rel of it, the windowed peak
    # wins. Correlation-level, so mover-latched warm SOLVES never enter:
    # measured corridor 0.132 -> 0.031 m ATE with the mover-street scenes
    # unchanged. 0 disables.
    bev_plaus_gate: float = 0.4
    bev_plaus_rel: float = 0.5
    # "score"-mode gates: solutions must be >hyp_separation_min apart (a
    # real aliasing event, not jitter) AND the warm residual below
    # hyp_score_factor x BEV's for the warm anchor to win.
    hyp_score_factor: float = 0.5
    hyp_separation_min: float = 0.15
    # Constant-velocity motion prior: a quadratic pull toward the solve's
    # anchor (warm start / BEV — scan_to_scan runs one solve per anchor and
    # picks by final residual), weighted so it only decides directions the
    # scan geometry leaves unobserved (straight-corridor scenes constrain
    # the along-road axis with a handful of oblique planes; without a prior
    # the GN solution wanders >1 m along that null direction). Weights are
    # information (1/sigma^2): trans sigma ~0.22 m, rot sigma ~0.07 rad.
    prior_trans_weight: float = 2.0
    prior_rot_weight: float = 50.0
    # Scan-to-local-map: register against the union of the last N feature
    # clouds instead of a single scan. Sparse far-field structure (narrow
    # visibility stripes) accumulates density across scans, keeping all six
    # DoF constrained where single-scan features vanish. The reference is
    # strictly scan-to-scan (lidarOdometry_onlyPC.cpp) and loses such axes.
    local_map_scans: int = 3
    knn_neighbors: int = 16  # neighborhood for plane fit (ref uses 30-NN then 5)
    plane_fit_points: int = 5  # 5-point plane fit (:207-220)
    # Furthest-of-5 proximity gate (:207). The reference uses an absolute 1 m
    # against dense real-Velodyne rows; feature spacing grows linearly with
    # range (angular sampling), so an absolute gate silently drops all
    # far-field planes — starving whole translation axes of constraints when
    # the only surfaces facing that axis are distant (measured: sum w*nx^2 of
    # 1.0 vs 500 for the constrained axes). Gate = max(max_fit_dist,
    # range_gate_factor * range) instead.
    max_fit_dist: float = 2.0
    range_gate_factor: float = 0.12
    coplanar_max: float = 0.15  # planeMax for 16-row (:315); 0.05 for 64-row
    huber_delta: float = 0.1  # HuberLoss(0.1) (:149)


@dataclasses.dataclass(frozen=True)
class EgoMotionConfig:
    """Flow-based ego-motion. Reference: scripts/PointCloudOdometry*.py."""

    gmm_components: int = 2  # GaussianMixture(n_components=2) (noSeg:98)
    gmm_iters: int = 25  # fixed-iteration EM inside jit (sklearn default max 100)
    gmm_reg_covar: float = 1e-6  # sklearn default covariance floor
    # Cauchy-IRLS refinement of the Kabsch fit on the LEARNED-mask paths
    # (SF/SSF): downweights flow outliers / missed movers. 0 = the
    # reference's single unweighted SVD. GT-seg keeps 0 regardless (the Seg
    # run defines the evo reference trajectory; see odometry/egomotion.py).
    irls_iters: int = 2
    irls_sigma: float = 0.05  # expected static flow error (m)
    # Seg-gated geometric refinement of the flow pose (odometry/flow_refine):
    # point-to-plane GN, source = static-masked previous cloud, target = the
    # current scan's ring-diverse planes, anchored at the flow pose. The
    # reference's SSF ego-motion is the bare seg-gated SVD (geom_refine=False,
    # main_sju_occ_addSeg_Pointnet2_ros.py:360-378); geometry removes the
    # spatially-correlated predicted-flow bias that the SVD inherits. Applies
    # to the learned-flow variants (SF/SSF) only — GT-flow paths define the
    # evo reference and stay bit-stable.
    geom_refine: bool = False
    refine_src_stride: int = 4  # source = every stride-th prev point
    refine_outer: int = 2  # association passes
    refine_gn_iters: int = 4
    refine_assoc_max_dist: float = 0.5  # m; flow init is already cm-accurate
    refine_huber: float = 0.03
    # Prior information (1/sigma^2): rot sigma ~0.06 rad, trans sigma ~0.3 m.
    # Deliberately WEAK — the prior's only job is holding directions the
    # planes leave unobserved (corridor along-track); measured: a 100x
    # stronger prior halves the refinement's bias removal (1.25 cm residual
    # vs 0.5 cm) because it drags the solution back toward the flow pose in
    # the directions geometry does constrain.
    refine_prior_rot: float = 250.0
    refine_prior_trans: float = 10.0
    refine_max_rot_step: float = 0.02
    refine_max_trans_step: float = 0.1
    # fail-safe acceptance gates vs the flow pose
    refine_max_trans: float = 0.3
    refine_max_rot: float = 0.05
    refine_min_inliers: int = 256
    # Residual-trim of the static mask before it anchors geometry (the
    # refine source AND the keyframe seg-gate): points whose flow residual
    # against the fitted rigid motion exceeds this (m) are treated as
    # movers even when the mask said static. This is what makes
    # ``sf --geom-refine`` safe — the GMM background cluster leaks slow
    # movers (measured round 3: sf 0.042 -> 0.114 m when the raw GMM mask
    # anchored the refinement); residual trimming removes exactly the
    # points whose motion disagrees with the rigid fit. Static flow error
    # is ~EPE (few cm); movers displace >= their per-frame motion (>=0.3 m
    # at 3 m/s, 10 Hz), so the gate separates cleanly.
    refine_trim_resid: float = 0.15


@dataclasses.dataclass(frozen=True)
class MappingConfig:
    """Keyframe pose-graph back-end. Reference: src/mapOptmization.cpp."""

    max_keyframes: int = 512  # preallocated keyframe buffer
    enable_loop_closure: bool = True  # static: compile the loop branch at all
    keyframe_trans_gate: float = 1.0  # >1 m => keyframe (mapOptmization.cpp:140-141)
    keyframe_rot_gate: float = 0.01  # >0.01 rad any axis => keyframe
    loop_search_radius: float = 15.0  # radiusSearch 15 m (:181)
    loop_time_gap: float = 20.0  # >20 s separation (:186)
    loop_min_keyframes: int = 5  # need >=5 keyframes before looping (:227)
    loop_skip_after_detect: int = 2  # skip 2 frames after detect (:196)
    loop_skip_after_close: int = 30  # skip 30 frames after closure (:254)
    loop_submap_halfwidth: int = 10  # +-10 keyframes submap (:236)
    icp_max_corr_dist: float = 50.0  # ICP maxCorrespondenceDistance (:241)
    icp_iters: int = 30  # ref runs 100 PCL iters; GN converges much faster
    # Loop-ICP accept gates on mean-SQUARED correspondence distance. The
    # reference gates at 0.2 (:250) — but it ICPs 0.1 m-voxel FULL clouds,
    # where perfect alignment gives near-zero NN distances. Here the
    # keyframe clouds are sparse PLANAR FEATURES (~0.5-1.5 m spacing), so
    # even exact alignment scores ~0.5-2 m^2; 0.2 rejected every true loop
    # on the out-and-back circuit (measured). Accept if EITHER the absolute
    # fitness clears ``icp_fitness_gate`` OR ICP genuinely converged —
    # post-fitness < icp_rel_improve x pre-fitness (a drifted revisit
    # starts misaligned, so real alignment shows a large drop). The
    # fitness-scaled factor noise (:263-275 parity) down-weights weak ones.
    icp_fitness_gate: float = 1.0
    icp_rel_improve: float = 0.6
    # (no icp voxel leaf: the reference's downSizeFilterICP (:461) is
    # replaced by the fixed-budget stride subsample in _build_submap)
    submap_points: int = 16384  # padded submap size for loop ICP
    posegraph_gn_iters: int = 8  # batch GN replacing iSAM2 updates (:280-293)
    # factor noise (diag variances) — mapOptmization.cpp:151,160,270
    prior_rot_var: float = 1e-2
    prior_trans_var: float = 1e8
    odom_rot_var: float = 1e-6
    odom_trans_var: float = 1e-4
    # Scan-to-submap refinement (no reference equivalent — mapOptmization
    # only gates keyframes and closes loops; between loop events the map
    # pose is raw integrated odometry, :450). Each new keyframe cloud is
    # point-to-plane registered against the recent keyframe submap and the
    # accepted correction folds into the loop-adjust transform, so drift
    # accumulates per keyframe hop instead of per frame.
    # DEFAULT ON since round 4 — the round-3 failure mode (keyframe clouds
    # retained mover points and the submap registration latched the mover
    # bloc, 0.04 -> 0.52 m ATE) is closed by seg_gate_keyframes below plus
    # the compacted submap subsample (mapping/keyframes.py::_build_submap).
    # Round-5 redesign (the round-4 implementation cost 112.9 -> 41.2
    # scans/s on the headline bench because it fit ring-diverse planes on
    # EVERY scan and TLS planes on a 16384-pt submap at every keyframe):
    # each keyframe now stores a STRIDED substore of normals
    # (refine_stride), the submap target reuses those stored normals
    # (rotated into the map frame — no per-event plane fitting on the
    # submap), the incoming scan's normals are fit only inside the
    # keyframe-event branch on the strided rows, and the registration is a
    # single association + short GN (mapping/keyframes.py::
    # _register_to_submap). Flow variants no longer fit any planes outside
    # keyframe events.
    scan_to_map_refine: bool = True
    refine_halfwidth: int = 6  # previous keyframes in the target submap
    refine_min_keyframes: int = 2
    refine_max_corr_dist: float = 1.0  # association gate (m)
    refine_max_trans: float = 0.5  # reject corrections larger than this (m)
    refine_max_rot: float = 0.05  # ... or this (rad)
    refine_min_inliers: int = 64
    # strided refine substore: every refine_stride-th feature row carries a
    # stored TLS normal (MapState.kf_rnorm); source and target of the
    # refine registration both live at this resolution
    refine_stride: int = 4
    refine_submap_points: int = 2048  # padded refine-target budget
    refine_gn_iters: int = 4  # single association, short GN
    refine_huber: float = 0.1
    # prior anchored at the incoming (odometry) pose: only submap-observed
    # directions move (rot sigma ~0.07 rad, trans sigma ~0.14 m)
    refine_prior_rot: float = 200.0
    refine_prior_trans: float = 50.0
    refine_max_rot_step: float = 0.05
    refine_max_trans_step: float = 0.2
    # Seg-gate the keyframe map: drop feature points near the warped
    # dynamic points (flow pair's movers advected into the current frame)
    # from the stored keyframe cloud. The reference aggregates RAW clouds
    # (src/mapOptmization.cpp:201-223), so its submaps retain movers — the
    # measured reason scan_to_map_refine used to be off by default (mover
    # blocs latch the submap registration, 0.04 -> 0.52 m). With the gate,
    # every flow variant's per-frame static mask finally reaches the
    # mapping boundary instead of being thrown away at the ego-motion SVD.
    # No-op for ONLY_PC (no segmentation exists there).
    seg_gate_keyframes: bool = True
    seg_gate_radius: float = 1.0  # m — mover clearance around warped points


@dataclasses.dataclass(frozen=True)
class FlowNetConfig:
    """TFlow scene-flow network. Reference: TFlowV3_Occlussion.py:65-101."""

    npoint: int = 8192
    # set-abstraction pyramid: points per level and mlp widths
    sa_npoints: Tuple[int, ...] = (2048, 512, 256, 128)
    sa_nsample: Tuple[int, ...] = (16, 16, 16, 8)
    sa_mlps: Tuple[Tuple[int, ...], ...] = (
        (32, 32, 64),
        (64, 64, 128),
        (128, 128, 256),
        (256, 256, 512),
    )
    cost_nsample: int = 16
    warp_nsample: Tuple[int, ...] = (3, 5, 7, 7)  # wraping_num per level (coarse->fine)
    upsample_k: Tuple[int, ...] = (5, 5, 7)  # flow_up_sample k between levels
    flow_clamp: float = 50.0  # re_sf.clamp(-50, 50) (soflow.py:515)
    warp_clamp: float = 10.0  # warped_pos2.clamp(-10, 10) (soflow.py:1257)
    upsample_clamp: float = 100.0  # dense_flow.clamp(-100, 100) (soflow.py:1474)
    leaky_rate: float = 0.1
    use_bn: bool = True  # BatchNorm in SA/UpConv (utils/utils.py:200)
    joint_seg: bool = False  # add_Seg_after_FLow: 4-channel flow+seg head
    dtype: str = "float32"  # compute dtype for the net ("bfloat16" for perf)
    # neighbor engine: "xla" (exact-ish approx_max_k path) or "banded"
    # (Morton-sorted Pallas kernels, ops/banded.py — the TPU fast path).
    # "banded" Morton-sorts the clouds at the stem and restores input order
    # on the outputs; results are approximate-kNN like "xla" but ~3x faster.
    neighbor_backend: str = "xla"
    morton_extent: float = 64.0  # half-extent (m) of the Morton code box
    # run the cost volume's attention+weightnet+aggregation chain as one
    # pallas kernel at inference on the banded path (ops/attention.py::
    # cost_attention_fused). MEASURED NEGATIVE at the bench operating point
    # (109.6 -> 101.4 scans/s; net fwd 10.7 -> 11.4 ms/scan) even though the
    # kernel beats the XLA chain in isolation (1.35 vs 1.84 ms): the pallas
    # boundary forfeits XLA's fusion of the chain's elementwise ops into the
    # producer MLPs and its overlap with the neighbor kernels. Kept behind
    # this flag as an A/B-able building block; see docs/PERFORMANCE.md.
    fuse_attention: bool = False


@dataclasses.dataclass(frozen=True)
class LossConfig:
    """multiScaleLoss. Reference: TFlowV3_Occlussion.py:199-220."""

    alpha: Tuple[float, ...] = (0.02, 0.04, 0.08, 0.16)
    seg_weight: float = 1.0  # BCE scale for the joint-seg head
    # inverse-frequency (static, moving) class weights for the seg BCE
    # (labelweights, my_carla.py:379-393); None = unweighted
    seg_class_weights: Tuple[float, float] | None = None


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training harness. Reference: main_sju_occ_ros.py:411-452 + .sh files."""

    lr: float = 1e-3
    weight_decay: float = 1e-4
    decay_steps: int = 200000
    decay_rate: float = 0.7
    lr_min: float = 1e-5
    epochs: int = 600
    batch_size: int = 16
    seed: int = 1234


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Top-level config: one per run, selects the variant and wires sub-configs."""

    variant: Variant = Variant.ONLY_PC
    lidar: LidarConfig = LidarConfig()
    features: FeatureConfig = FeatureConfig()
    odometry: OdometryConfig = OdometryConfig()
    egomotion: EgoMotionConfig = EgoMotionConfig()
    mapping: MappingConfig = MappingConfig()
    flownet: FlowNetConfig = FlowNetConfig()
    loss: LossConfig = LossConfig()
    train: TrainConfig = TrainConfig()
    max_scans: int = 2048  # max sequence length for the preallocated scan loop

    def replace(self, **kw) -> "PipelineConfig":
        return dataclasses.replace(self, **kw)


def for_variant(variant: Variant, **kw) -> PipelineConfig:
    """Build the default config for a pipeline variant."""
    return PipelineConfig(variant=variant, **kw)
