"""Closed-loop integration tests: synthetic sequence -> trajectory -> ATE."""

import dataclasses

import numpy as np
import pytest

from ssf_slam_tpu.config import (
    FeatureConfig,
    MappingConfig,
    PipelineConfig,
    Variant,
)
from ssf_slam_tpu.data.synthetic import generate_sequence
from ssf_slam_tpu.engine import ate_rmse, run_sequence, write_tum, read_tum

SMALL_MAP = MappingConfig(max_keyframes=64, submap_points=2048, icp_iters=10,
                          loop_submap_halfwidth=3)


N_PTS = 4096  # suite operating point: full-size 8192 runs on-chip
# (bench.py, the driver dryrun) and in test_parallel's sharded test


def small_cfg(variant: Variant) -> PipelineConfig:
    cfg = PipelineConfig(
        variant=variant,
        features=FeatureConfig(max_features=2048),
        mapping=SMALL_MAP,
    )
    return cfg.replace(
        lidar=dataclasses.replace(cfg.lidar, max_points=N_PTS))


@pytest.fixture(scope="module")
def seq():
    # straight-ish drive, no movers: every variant must track it
    def traj(k):
        return np.array([1.2 * k, 0.05 * k, 1.8]), 0.04 * k

    return generate_sequence(
        n_frames=8, n_points=N_PTS, seed=11, noise=0.004, n_moving=0,
        trajectory=traj,
    )


def true_positions(seq):
    return np.stack([f["pose1"][1] for f in seq])


def rel_truth(seq):
    # ground truth is the world-frame sensor position; SLAM output is in the
    # frame of scan 0 -> compare after rigid alignment (ATE convention)
    return true_positions(seq)


@pytest.mark.parametrize("variant", [Variant.SEG, Variant.NO_SEG])
def test_flow_variants_track_trajectory(seq, variant):
    cfg = small_cfg(variant)
    state, outs = run_sequence(seq, cfg)
    ate = ate_rmse(outs["pose_t"], rel_truth(seq))
    assert ate < 0.05, f"{variant}: ATE {ate:.3f} m"


def test_onlypc_tracks_trajectory():
    # onlyPC needs full ring density: plane-fit curvature gates are
    # calibrated to azimuth spacing (same effect as the 64-row test's
    # density analysis; measured 0.305 m ATE at 4096 pts vs 0.109 at 8192)
    def traj(k):
        return np.array([1.2 * k, 0.05 * k, 1.8]), 0.04 * k

    seq = generate_sequence(
        n_frames=8, n_points=8192, seed=11, noise=0.004, n_moving=0,
        trajectory=traj,
    )
    cfg = PipelineConfig(
        variant=Variant.ONLY_PC,
        features=FeatureConfig(max_features=2048),
        mapping=SMALL_MAP,
    )
    state, outs = run_sequence(seq, cfg)
    ate = ate_rmse(outs["pose_t"], rel_truth(seq))
    # A dead-straight corridor is the geometric worst case (the along-road
    # axis is near-unobservable from planes; see OdometryConfig prior
    # notes). Round-3 forensics: this scene measured 0.132 m, ~ALL of it
    # one frame where the BEV init aliased one building period along the
    # road (per-frame errors otherwise +-3 cm). Round 4 closed it INSIDE
    # the correlation — bev_pose_init's dynamics-windowed plausibility
    # pick (OdometryConfig.bev_plaus_gate) — measured 0.132 -> 0.023 here
    # (0.021 with scan-to-map refine, now default-on), with the mover
    # scenes unchanged. The rejected alternative, a dual-anchor solve
    # picking by final residual (hypothesis_pick="score"), also fixes THIS
    # scene but compounds in dynamic ones (a warm-anchored solve latched
    # onto a coherent mover bloc scores a genuinely lower residual than
    # the true pose; 0.04 -> 0.52 m measured). Mover corruption of onlyPC
    # is the reference project's raison d'etre — the flow variants are its
    # answer.
    assert ate < 0.10, f"onlyPC: ATE {ate:.3f} m"


def test_seg_variant_with_movers():
    def traj(k):
        return np.array([1.0 * k, 0.0, 1.8]), 0.0

    seq = generate_sequence(
        n_frames=8, n_points=N_PTS, seed=13, noise=0.004, n_moving=4,
        trajectory=traj,
    )
    cfg = small_cfg(Variant.SEG)
    state, outs = run_sequence(seq, cfg)
    ate = ate_rmse(outs["pose_t"], true_positions(seq))
    assert ate < 0.05, f"SEG with movers: ATE {ate:.3f} m"

    # noSeg (GMM) must also reject the movers
    cfg = small_cfg(Variant.NO_SEG)
    state, outs = run_sequence(seq, cfg)
    ate = ate_rmse(outs["pose_t"], true_positions(seq))
    assert ate < 0.08, f"noSeg with movers: ATE {ate:.3f} m"


def test_ssf_variant_with_provided_mask(seq):
    # SSF path with an oracle static mask (stands in for the seg net)
    for f in seq:
        f["static_mask"] = f["s_fg_mask"] < 0.5
    cfg = small_cfg(Variant.SSF)
    state, outs = run_sequence(seq, cfg)
    ate = ate_rmse(outs["pose_t"], rel_truth(seq))
    assert ate < 0.05


def test_tum_roundtrip(tmp_path, seq):
    cfg = small_cfg(Variant.SEG)
    state, outs = run_sequence(seq, cfg)
    path = str(tmp_path / "traj.tum")
    times = [f["time"] for f in seq]
    write_tum(path, times, outs["pose_t"], outs["pose_q"])
    t, p, q = read_tum(path)
    np.testing.assert_allclose(p, outs["pose_t"], atol=1e-5)
    assert q.shape == (len(seq), 4)


def test_fused_ssf_step(seq):
    import dataclasses

    import jax

    from ssf_slam_tpu.config import FlowNetConfig
    from ssf_slam_tpu.engine.fused import run_sequence_fused
    from ssf_slam_tpu.models import TFlow

    net_cfg = FlowNetConfig(
        npoint=N_PTS, sa_npoints=(256, 64, 32, 16), sa_nsample=(8, 8, 8, 8),
        cost_nsample=8, joint_seg=True,
    )
    model = TFlow(cfg=net_cfg)
    rng = jax.random.PRNGKey(0)
    import jax.numpy as jnp

    pc = jnp.zeros((1, N_PTS, 3))
    variables = jax.jit(model.init)(rng, pc, pc)
    cfg = small_cfg(Variant.SSF)
    state, outs = run_sequence_fused(model, variables, seq[:4], cfg)
    assert outs["pose_t"].shape == (4, 3)
    assert np.isfinite(outs["pose_t"]).all()


def test_rpe_metric():
    from scipy.spatial.transform import Rotation

    from ssf_slam_tpu.engine import rpe, rpe_rmse

    n = 20
    ref = np.cumsum(np.ones((n, 3)), axis=0)
    eye = np.tile(np.eye(3), (n, 1, 1))
    # rigid offset: zero relative error
    est = ref + np.array([100.0, 0, 0])
    assert rpe_rmse(est, ref, eye, eye) < 1e-9
    # 10% per-step scale drift
    assert rpe_rmse(ref * 1.1, ref, eye, eye) > 0.1

    ref3 = np.stack(
        [np.arange(n, dtype=float), np.zeros(n), np.zeros(n)], axis=1
    )

    # golden value 1 (the case the round-1 step-length stand-in scored ~0):
    # estimate walks at the correct unit speed but 10 deg off-heading, with
    # identity orientations. Per pair the translation error is
    # |[cos10-1, sin10, 0]| = 2 sin(5 deg).
    theta = np.radians(10.0)
    d = np.array([np.cos(theta), np.sin(theta), 0.0])
    est3 = np.arange(n, dtype=float)[:, None] * d
    r = rpe(est3, eye, ref3, eye)
    assert abs(r["trans_rmse"] - 2.0 * np.sin(theta / 2.0)) < 1e-9
    assert r["rot_rmse_deg"] < 1e-6

    # golden value 2: orientation drifting 10 deg/step while the per-frame
    # relative motion in the body frame matches the reference exactly —
    # translation RPE ~0, rotation RPE exactly 10 deg.
    yaw = theta * np.arange(n)
    est_rot = Rotation.from_euler("z", yaw[:, None]).as_matrix()
    steps = est_rot[:-1] @ np.array([1.0, 0.0, 0.0])
    est4 = np.concatenate([np.zeros((1, 3)), np.cumsum(steps, axis=0)])
    r = rpe(est4, est_rot, ref3, eye)
    assert r["trans_rmse"] < 1e-9
    assert abs(r["rot_rmse_deg"] - 10.0) < 1e-6
    # quat input path agrees with the matrix path
    quats = Rotation.from_matrix(est_rot).as_quat()
    r2 = rpe(est4, quats, ref3, eye)
    assert abs(r2["rot_rmse_deg"] - r["rot_rmse_deg"]) < 1e-9


def test_cli_run_smoke(tmp_path):
    from ssf_slam_tpu.cli import main

    out = str(tmp_path / "t.tum")
    rc = main(["run", "--variant", "seg", "--synthetic", "--frames", "3",
               "--out", out])
    assert rc == 0
    from ssf_slam_tpu.engine import read_tum

    t, p, q = read_tum(out)
    assert len(t) == 3


def test_loop_closure_improves_ate_full_engine():
    """Out-and-back circuit through the FULL engine: loop closure must fire
    on the return leg and materially reduce ATE vs the loop-disabled run.

    The reference's loop pipeline (src/mapOptmization.cpp:168-293) is
    otherwise only exercised by the miniature mapping-step test; this runs
    segmentation -> ego-motion -> keyframes -> loop ICP -> pose graph
    end-to-end on a revisiting trajectory. A 3% flow-scale bias injects the
    odometry drift the closure must repair (the same fault-injection idea
    as the miniature test's per-step drift).
    """
    from ssf_slam_tpu.config import PipelineConfig, Variant
    from ssf_slam_tpu.data.synthetic import generate_sequence
    from ssf_slam_tpu.engine import ate_rmse, run_sequence

    frames = generate_sequence(
        n_frames=72, n_points=4096, seed=21, noise=0.004, n_moving=0,
        trajectory="loop",
    )
    for f in frames:
        f["gt"] = f["gt"] * 1.03  # systematic odometry bias -> linear drift
    true_pos = np.stack([f["pose1"][1] for f in frames])

    base = PipelineConfig(variant=Variant.NO_SEG)
    base = base.replace(
        lidar=dataclasses.replace(base.lidar, max_points=4096),
        # gates scaled to the 72-frame circuit: the return leg re-enters
        # the search radius >5 s after the outbound pass only on the first
        # ~11 outbound frames (gap = 7.2 - 0.2*i seconds at dt=0.1)
        # scan_to_map_refine (default-on since round 4) repairs most of the
        # injected bias on its own, which would mask the loop machinery
        # this test isolates — pin it off in BOTH runs
        mapping=dataclasses.replace(
            base.mapping, loop_search_radius=8.0, loop_time_gap=5.0,
            loop_skip_after_close=10, scan_to_map_refine=False),
    )

    state_on, outs_on = run_sequence(frames, base)
    ate_on = ate_rmse(outs_on["pose_t"], true_pos)
    n_loops = int(state_on.map_state.n_loops)
    assert n_loops > 0, "no loop closure fired on the out-and-back circuit"

    cfg_off = base.replace(
        mapping=dataclasses.replace(base.mapping,
                                    enable_loop_closure=False))
    _, outs_off = run_sequence(frames, cfg_off)
    ate_off = ate_rmse(outs_off["pose_t"], true_pos)
    # the biased run drifts ~metres; closure must recover most of it
    assert ate_on < 0.8 * ate_off, (ate_on, ate_off, n_loops)


def test_cli_evaluate_smoke(tmp_path, capsys):
    """The evo-protocol table (README.md:64-72 parity): TUM + KITTI files
    per variant and a Seg-referenced comparison table on stdout."""
    from ssf_slam_tpu.cli import main

    out_dir = str(tmp_path / "res")
    rc = main(["evaluate", "--synthetic", "--frames", "3",
               "--variants", "noseg", "--out-dir", out_dir])
    assert rc == 0
    import os

    for name in ("00_SEG.tum", "00_SEG.kitti", "00_NOSEG.tum",
                 "00_NOSEG.kitti"):
        assert os.path.exists(os.path.join(out_dir, name)), name
    table = capsys.readouterr().out
    assert "| variant |" in table and "| noseg |" in table
    # KITTI rows are 12 floats (3x4 pose matrices)
    from ssf_slam_tpu.utils.poses import read_kitti_poses

    mats = read_kitti_poses(os.path.join(out_dir, "00_NOSEG.kitti"))
    assert mats.shape == (3, 3, 4) or mats.shape == (3, 4, 4)


def test_fused_ssfc_classifier_step(seq):
    """P6: the separate SegNet classifier produces the static mask inside
    the fused step (main_sju_occ_addSeg_Pointnet2_ros.py:360-378 parity)."""
    import jax
    import jax.numpy as jnp

    from ssf_slam_tpu.config import FlowNetConfig
    from ssf_slam_tpu.engine.fused import run_sequence_fused
    from ssf_slam_tpu.models import TFlow
    from ssf_slam_tpu.models.segnet import SegNet

    net_cfg = FlowNetConfig(
        npoint=N_PTS, sa_npoints=(256, 64, 32, 16), sa_nsample=(8, 8, 8, 8),
        cost_nsample=8, joint_seg=True,
    )
    model = TFlow(cfg=net_cfg)
    rng = jax.random.PRNGKey(0)
    pc = jnp.zeros((1, N_PTS, 3))
    variables = jax.jit(model.init)(rng, pc, pc)

    seg = SegNet(n_classes=2, sa_npoints=(256, 64), head=(32, 32),
                 sa_mlps=((16, 16), (32, 32)))
    seg_vars = jax.jit(lambda: seg.init(rng, pc, pc))()

    def seg_apply(xyz, flow):
        return seg.apply(seg_vars, xyz, flow)

    cfg = small_cfg(Variant.SSF)
    state, outs = run_sequence_fused(model, variables, seq[:3], cfg,
                                     seg_apply=seg_apply)
    assert outs["pose_t"].shape == (3, 3)
    assert np.isfinite(outs["pose_t"]).all()


def test_streaming_runner(seq, tmp_path):
    """Online mode: per-arriving-scan step == batch fused scan semantics,
    incremental TUM output, latency stats."""
    import jax
    import jax.numpy as jnp

    from ssf_slam_tpu.config import FlowNetConfig
    from ssf_slam_tpu.engine import read_tum
    from ssf_slam_tpu.engine.streaming import StreamingRunner
    from ssf_slam_tpu.models import TFlow

    net_cfg = FlowNetConfig(
        npoint=N_PTS, sa_npoints=(256, 64, 32, 16), sa_nsample=(8, 8, 8, 8),
        cost_nsample=8, joint_seg=True,
    )
    model = TFlow(cfg=net_cfg)
    rng = jax.random.PRNGKey(0)
    pc = jnp.zeros((1, N_PTS, 3))
    variables = jax.jit(model.init)(rng, pc, pc)
    cfg = small_cfg(Variant.SSF)

    tum = str(tmp_path / "stream.tum")
    runner = StreamingRunner(model, variables, cfg, tum_path=tum)
    stats = runner.run(iter(seq[:3]))
    assert stats["n_scans"] == 3
    assert stats["latency_ms_mean"] > 0
    t, p, q = read_tum(tum)
    assert p.shape == (3, 3)
    assert np.isfinite(p).all()


def test_onlypc_64row_operating_point():
    """Closed-loop 64-row LiDAR config: HDL-64 elevation model + the 64-row
    thresholds (src/frameFeature.cpp:148-152: planeMin 0.005, planeSpan 25,
    row margins 5) through feature extraction + onlyPC odometry.

    Density matters: the reference's frameFeature consumes the FULL
    /velodyne_points cloud (~131k points for an HDL-64), and planeMin=0.005
    is calibrated to that ring density — ring-path curvature scales with
    azimuth spacing squared, so at an 8192-point subsample the gate rejects
    every facade and the along-road axis starves (measured: ATE 2.0 m at
    8192 pts vs 0.035 m at full density). The test runs the true operating
    point; max_points is per-variant config, 8192 is only the NETWORK's
    input size (main_sju_occ_ros.py:507)."""
    from ssf_slam_tpu.config import LidarConfig
    from ssf_slam_tpu.frontend.features import assign_scan_rows
    import jax.numpy as jnp

    def traj(k):
        return np.array([1.2 * k, 0.05 * k, 1.8]), 0.04 * k

    n = 131072
    seq64 = generate_sequence(
        n_frames=4, n_points=n, n_rows=64, seed=13, noise=0.002,
        n_moving=0, trajectory=traj,
    )
    lidar64 = LidarConfig(n_scan_rows=64, max_points=n)
    # the generated elevation pattern must invert through the HDL-64 row
    # binning: every valid point lands in a legal row
    rows = np.asarray(assign_scan_rows(
        jnp.asarray(seq64[0]["pos1"]), lidar64))
    m = seq64[0]["mask1"]
    frac_valid = float((rows[m] >= 0).mean())
    assert frac_valid > 0.9, frac_valid
    assert rows[m].max() >= 48  # lower block populated
    cfg = dataclasses.replace(
        small_cfg(Variant.ONLY_PC), lidar=lidar64,
        features=FeatureConfig(max_features=4096))
    state, outs = run_sequence(seq64, cfg)
    ate = ate_rmse(outs["pose_t"], np.stack([f["pose1"][1] for f in seq64]))
    assert ate < 0.1, f"64-row onlyPC ATE {ate:.3f} m"


def test_near_dynamic_gate_unit():
    """_near_dynamic: feature points within the radius of any warped mover
    are flagged; the all-static frame flags nothing (engine/pipeline.py)."""
    from ssf_slam_tpu.engine.pipeline import _near_dynamic
    import jax.numpy as jnp

    feat = jnp.array([[0.0, 0, 0], [5.0, 0, 0], [5.6, 0, 0], [20.0, 3, 1]])
    warped = jnp.array([[5.0, 0, 0], [40.0, 0, 0]])
    dyn = jnp.array([True, False])  # only the first warped point is a mover
    near = np.asarray(_near_dynamic(feat, warped, dyn, radius=1.0))
    np.testing.assert_array_equal(near, [False, True, True, False])
    # no movers at all -> nothing gated
    none = np.asarray(_near_dynamic(feat, warped, jnp.zeros(2, bool), 1.0))
    assert not none.any()


def test_seg_gate_keeps_movers_out_of_keyframes():
    """SSF with seg_gate_keyframes must store fewer keyframe points than
    the raw-cloud configuration (movers + their clearance are dropped),
    and the gated run's ATE must not regress (engine/pipeline.py slam_step;
    the reference stores raw clouds, mapOptmization.cpp:201-223)."""
    def traj(k):
        return np.array([1.0 * k, 0.0, 1.8]), 0.0

    seq = generate_sequence(
        n_frames=8, n_points=N_PTS, seed=13, noise=0.004, n_moving=4,
        trajectory=traj,
    )
    for f in seq:
        f["static_mask"] = f["s_fg_mask"] < 0.5
    counts, ates = {}, {}
    for gate in (False, True):
        m = dataclasses.replace(SMALL_MAP, seg_gate_keyframes=gate)
        cfg = dataclasses.replace(small_cfg(Variant.SSF), mapping=m)
        state, outs = run_sequence(seq, cfg)
        ms = state.map_state
        n_kf = int(ms.n_kf)
        counts[gate] = int(np.asarray(ms.kf_cloud_mask[:n_kf]).sum())
        ates[gate] = ate_rmse(outs["pose_t"], true_positions(seq))
    assert counts[True] < counts[False], counts
    assert ates[True] <= ates[False] + 0.005, ates
