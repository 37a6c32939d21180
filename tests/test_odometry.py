"""Odometry tests: plane fitting, scan-to-scan GN, flow ego-motion."""

import jax.numpy as jnp
import numpy as np
import pytest

from ssf_slam_tpu.config import LidarConfig, OdometryConfig
from ssf_slam_tpu.data.synthetic import SyntheticWorld, simulate_scan
from ssf_slam_tpu.frontend import extract_plane_features
from ssf_slam_tpu.odometry import (
    ego_motion_gmm,
    ego_motion_gt_seg,
    fit_ring_diverse_planes,
    scan_to_scan,
)
from ssf_slam_tpu.ops.se3 import quat_rotate, quat_to_matrix


def make_feature_cloud(world, pos, yaw, seed=0):
    from ssf_slam_tpu.data.synthetic import subsample_scan

    rng = np.random.default_rng(seed)
    pts, mask, oid = simulate_scan(
        world, pos, yaw, 0.0, pts_per_row=1024, noise=0.004, rng=rng
    )
    scan, m, _ = subsample_scan(pts, mask, oid, 8192, rng)
    return extract_plane_features(jnp.asarray(scan), jnp.asarray(m), LidarConfig())


@pytest.fixture(scope="module")
def world():
    """Deterministic all-axis-observable scene for the REGISTRATION tests.

    These tests probe GN *convergence* given adequate geometry, not scene
    observability, so the fixture is purpose-built: ground plus four
    well-separated, mutually-orthogonal facades at staggered distances (no
    repeated structure to alias onto, every translation axis constrained).
    Random traffic scenes are exercised by the engine-level tests.
    """
    from ssf_slam_tpu.data.synthetic import Box

    boxes = []
    for c, s in (
        ((18.0, 2.0, 0.0), (1.0, 26.0, 7.0)),   # +x facade
        ((-14.0, -3.0, 0.0), (1.0, 22.0, 6.0)),  # -x facade
        ((3.0, 12.0, 0.0), (30.0, 1.0, 8.0)),    # +y facade
        ((-2.0, -9.0, 0.0), (24.0, 1.0, 5.0)),   # -y facade
    ):
        c, s = np.array(c), np.array(s, float)
        c[2] = s[2] / 2
        boxes.append(Box(c, s, np.zeros(3)))
    return SyntheticWorld(boxes=boxes, extent=60.0)


def test_plane_normals_on_ground(world):
    cloud = make_feature_cloud(world, np.array([0.0, 0, 1.8]), 0.0)
    planes = fit_ring_diverse_planes(cloud)
    m = np.asarray(planes.valid)
    assert m.sum() > 200  # 4-facade fixture: fewer but cleaner planes
    # ground points (z ~ -1.8 in sensor frame) must have near-vertical normals
    xyz = np.asarray(cloud.xyz)
    nrm = np.asarray(planes.normal)
    ground = m & (np.abs(xyz[:, 2] + 1.8) < 0.1)
    assert ground.sum() > 50  # narrow z-slice of the ground ring
    up = np.abs(nrm[ground][:, 2])
    assert np.median(up) > 0.98


def test_scan_to_scan_recovers_motion(world):
    pos1, yaw1 = np.array([0.0, 0.0, 1.8]), 0.0
    pos2, yaw2 = np.array([0.6, 0.05, 1.8]), 0.03
    last = make_feature_cloud(world, pos1, yaw1, seed=1)
    curr = make_feature_cloud(world, pos2, yaw2, seed=2)
    planes = fit_ring_diverse_planes(last)

    # Coarse warm start (~10 cm off), as the pipeline's BEV initializer
    # provides (odometry/bev_init.py): the raw GN's contract is local
    # refinement — from a zero start at 0.6 m motion the 1.5 m association
    # radius can alias onto repeated facade structure.
    q, t, n_in = scan_to_scan(
        curr, last, planes, jnp.array([0, 0, 0, 1.0]),
        jnp.array([0.5, 0.0, 0.0]),
    )
    assert int(n_in) > 200

    # ground truth: p_last = R_rel p_curr + t_rel with
    # R_rel = R1^T R2, t_rel = R1^T (t2 - t1) (z-yaw only here)
    c1, s1 = np.cos(yaw1), np.sin(yaw1)
    c2, s2 = np.cos(yaw2), np.sin(yaw2)
    r1 = np.array([[c1, -s1, 0], [s1, c1, 0], [0, 0, 1]])
    r2 = np.array([[c2, -s2, 0], [s2, c2, 0], [0, 0, 1]])
    r_rel = r1.T @ r2
    t_rel = r1.T @ (pos2 - pos1)

    np.testing.assert_allclose(np.asarray(quat_to_matrix(q)), r_rel, atol=5e-3)
    np.testing.assert_allclose(np.asarray(t), t_rel, atol=5e-2)


def test_scan_to_scan_identity(world):
    cloud = make_feature_cloud(world, np.array([0.0, 0, 1.8]), 0.0, seed=3)
    planes = fit_ring_diverse_planes(cloud)
    q, t, _ = scan_to_scan(
        cloud, cloud, planes, jnp.array([0, 0, 0, 1.0]), jnp.zeros(3)
    )
    np.testing.assert_allclose(np.asarray(t), 0.0, atol=5e-3)
    np.testing.assert_allclose(abs(float(q[3])), 1.0, atol=1e-5)


def test_ego_motion_gt_seg():
    rng = np.random.default_rng(0)
    pts = rng.uniform(-30, 30, (2000, 3)).astype(np.float32)
    yaw = 0.02
    c, s = np.cos(yaw), np.sin(yaw)
    r2 = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    t2 = np.array([0.5, -0.2, 0.01], np.float32)
    # flow maps frame1 -> frame2 coords; inverse rigid: p2 = R^T(p1 - t)
    warped = (pts - t2) @ r2
    flow = warped - pts
    fg = np.zeros(2000, np.float32)
    fg[:300] = 1.0
    flow[:300] += rng.normal(3.0, 0.3, (300, 3))  # movers corrupt flow
    q, t = ego_motion_gt_seg(
        jnp.asarray(pts), jnp.asarray(flow), jnp.asarray(fg),
        jnp.ones(2000, bool),
    )
    # recovered transform maps frame2 back to frame1: p1 = R p2 + t
    back = quat_rotate(q[None], jnp.asarray(warped)) + t[None]
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-3)


def test_ego_motion_gmm_rejects_movers():
    rng = np.random.default_rng(1)
    pts = rng.uniform(-30, 30, (3000, 3)).astype(np.float32)
    yaw = -0.03
    c, s = np.cos(yaw), np.sin(yaw)
    r2 = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)
    t2 = np.array([-0.8, 0.3, 0.0], np.float32)
    warped = (pts - t2) @ r2
    flow = warped - pts
    flow[:400] += np.array([2.5, 0.5, 0.0], np.float32)  # movers
    q, t, bg = ego_motion_gmm(
        jnp.asarray(pts), jnp.asarray(flow), jnp.ones(3000, bool)
    )
    bg = np.asarray(bg)
    assert bg[:400].mean() < 0.1  # movers excluded
    assert bg[400:].mean() > 0.9
    back = quat_rotate(q[None], jnp.asarray(warped)) + t[None]
    np.testing.assert_allclose(np.asarray(back), pts, atol=1e-3)


def test_irls_rejects_missed_movers():
    """Cauchy-IRLS Kabsch refinement recovers the rigid motion when the
    static mask wrongly includes moving points (the learned-seg failure
    mode the refinement exists for)."""
    import jax.numpy as jnp
    from scipy.spatial.transform import Rotation

    from ssf_slam_tpu.odometry.egomotion import ego_motion_from_flow
    from ssf_slam_tpu.ops.se3 import quat_rotate

    rng = np.random.default_rng(3)
    n = 2048
    pts = rng.uniform(-20, 20, (n, 3)).astype(np.float32)
    r_true = Rotation.from_euler("xyz", [0.5, -0.3, 2.0], degrees=True)
    t_true = np.array([1.1, -0.2, 0.05], np.float32)
    # flow takes frame-1 points to frame 2: p2 = R^T (p1 - t)  (inverse of
    # the published p_last = R p_curr + t convention)
    p2 = (pts - t_true) @ r_true.as_matrix().astype(np.float32)
    flow = (p2 - pts) + rng.normal(0, 0.01, (n, 3)).astype(np.float32)
    # 10% of "static" points are actually movers with +2 m rogue flow
    n_bad = n // 10
    flow[:n_bad] += np.array([2.0, 0.6, 0.0], np.float32)
    static = np.ones(n, bool)

    def fit_err(iters):
        q, t = ego_motion_from_flow(
            jnp.asarray(pts), jnp.asarray(flow), jnp.asarray(static),
            irls_iters=iters)
        # apply to clean p2: recovered motion must map p2 back to pts
        back = np.asarray(quat_rotate(jnp.asarray(q)[None],
                                      jnp.asarray(p2))) + np.asarray(t)
        return float(np.abs(back - pts).mean()), np.asarray(t)

    err0, t0 = fit_err(0)
    err2, t2 = fit_err(3)
    assert err2 < err0 * 0.2, (err0, err2)
    np.testing.assert_allclose(t2, t_true, atol=0.02)


def test_fit_local_planes_ringless():
    """TLS plane fits on a ring-less cloud (scan-to-map submap contract,
    odometry/scan2map.py): normals recovered on clean surfaces, collinear /
    thick neighborhoods gated out."""
    from ssf_slam_tpu.odometry.scan2map import fit_local_planes

    rng = np.random.default_rng(0)
    n = 512
    ground = np.stack(
        [rng.uniform(-10, 10, n), rng.uniform(-10, 10, n), np.zeros(n)], 1
    )
    wall = np.stack(
        [rng.uniform(-10, 10, n), np.full(n, 12.0), rng.uniform(0, 4, n)], 1
    )
    # a line of points (rail): spread gate must reject these
    line = np.stack(
        [np.linspace(-5, 5, 64), np.full(64, -12.0), np.full(64, 1.0)], 1
    )
    # volumetric clutter (canopy): thickness gate must reject
    blob = rng.uniform(-1, 1, (64, 3)) + np.array([8.0, -8.0, 2.0])
    pts = np.concatenate([ground, wall, line, blob]).astype(np.float32)
    pts += rng.normal(0, 0.003, pts.shape).astype(np.float32)
    mask = np.ones(len(pts), bool)

    planes = fit_local_planes(jnp.asarray(pts), jnp.asarray(mask))
    nrm = np.asarray(planes.normal)
    val = np.asarray(planes.valid)

    g_val, w_val = val[:n], val[n : 2 * n]
    assert g_val.mean() > 0.8 and w_val.mean() > 0.8
    # recovered normals: ground +-z, wall +-y
    assert (np.abs(nrm[:n, 2])[g_val] > 0.95).mean() > 0.95
    assert (np.abs(nrm[n : 2 * n, 1])[w_val] > 0.95).mean() > 0.95
    # degenerate neighborhoods rejected
    assert val[2 * n : 2 * n + 64].mean() < 0.2  # collinear
    assert val[2 * n + 64 :].mean() < 0.2  # volumetric


def test_refine_flow_pose_removes_correlated_flow_bias(world):
    """Seg-gated geometric refinement (odometry/flow_refine.py): predicted
    flow carries spatially-CORRELATED error (a biased patch does not average
    out over the Kabsch fit the way white noise does), so the flow-SVD pose
    inherits centimeter bias. Point-to-plane refinement against the current
    scan's planes must remove most of it — geometry has no flow error."""
    from ssf_slam_tpu.config import EgoMotionConfig
    from ssf_slam_tpu.data.synthetic import subsample_scan
    from ssf_slam_tpu.odometry import refine_flow_pose

    rng = np.random.default_rng(7)
    pos1, yaw1 = np.array([0.0, 0.0, 1.8]), 0.0
    pos2, yaw2 = np.array([0.9, 0.08, 1.8]), 0.04

    def scan_at(pos, yaw, seed):
        r = np.random.default_rng(seed)
        pts, mask, oid = simulate_scan(
            world, pos, yaw, 0.0, pts_per_row=1024, noise=0.004, rng=r)
        return subsample_scan(pts, mask, oid, 8192, r)

    p1, m1, _ = scan_at(pos1, yaw1, 11)
    p2m, m2, _ = scan_at(pos2, yaw2, 12)

    # ground truth p_last = R_rel p_curr + t_rel
    def rot(yaw):
        c, s = np.cos(yaw), np.sin(yaw)
        return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float32)

    r_rel = rot(yaw1).T @ rot(yaw2)
    t_rel = (rot(yaw1).T @ (pos2 - pos1)).astype(np.float32)

    # GT flow frame1 -> frame2 coords, corrupted by a smooth correlated bias
    # (amplitude ~3 cm, wavelength ~20 m — the shape of real net error) plus
    # white noise at the trained model's EPE scale
    p1f2 = (p1 - t_rel) @ r_rel
    flow = p1f2 - p1
    bias = 0.03 * np.sin(p1 @ np.array(
        [[0.3, 0.1, 0.0], [0.0, 0.25, 0.1], [0.1, 0.0, 0.2]], np.float32))
    # ... and a one-sided component: net error concentrates on particular
    # surfaces (the far facade, the ground ring), it is not zero-mean
    bias[p1[:, 0] > 0] += np.array([0.03, -0.01, 0.0], np.float32)
    flow = flow + bias + rng.normal(0, 0.01, flow.shape).astype(np.float32)
    static = m1.copy()

    cfg = EgoMotionConfig(geom_refine=True)
    q0, t0 = ego_motion_gt_seg(
        jnp.asarray(p1), jnp.asarray(flow),
        jnp.zeros(len(p1), np.float32), jnp.asarray(static))
    e0 = float(np.linalg.norm(np.asarray(t0) - t_rel))
    assert e0 > 0.008, e0  # the correlated bias must actually bite

    feat = extract_plane_features(
        jnp.asarray(p2m), jnp.asarray(m2), LidarConfig())
    planes = fit_ring_diverse_planes(feat)
    q, t = refine_flow_pose(
        jnp.asarray(p1), jnp.asarray(static), feat, planes, q0, t0, cfg)
    e1 = float(np.linalg.norm(np.asarray(t) - t_rel))
    assert e1 < 0.6 * e0, (e0, e1)
    assert e1 < 0.015, (e0, e1)
    # rotation sanity
    np.testing.assert_allclose(
        np.asarray(quat_to_matrix(q)), r_rel, atol=5e-3)


def test_refine_flow_pose_failsafe_returns_flow_pose(world):
    """With no valid target planes the gates must reject the refinement and
    return the flow pose bit-unchanged."""
    from ssf_slam_tpu.config import EgoMotionConfig
    from ssf_slam_tpu.odometry import refine_flow_pose
    from ssf_slam_tpu.odometry.scan2scan import PlaneModel

    rng = np.random.default_rng(0)
    p1 = rng.uniform(-20, 20, (1024, 3)).astype(np.float32)
    feat = extract_plane_features(
        jnp.asarray(p1), jnp.ones(1024, bool), LidarConfig())
    planes = PlaneModel(
        normal=jnp.zeros_like(feat.xyz), valid=jnp.zeros(feat.xyz.shape[0], bool))
    q0 = jnp.array([0.0, 0.0, 0.1, 0.99])
    q0 = q0 / jnp.linalg.norm(q0)
    t0 = jnp.array([0.5, -0.2, 0.01])
    q, t = refine_flow_pose(
        jnp.asarray(p1), jnp.ones(1024, bool), feat, planes, q0, t0,
        EgoMotionConfig(geom_refine=True))
    np.testing.assert_array_equal(np.asarray(q), np.asarray(q0))
    np.testing.assert_array_equal(np.asarray(t), np.asarray(t0))


def test_bev_plaus_window_rejects_alias():
    """Periodic-structure alias: the global BEV argmax lands one period
    away from the truth, the dynamics-windowed pick recovers it.

    Constructed so the alias peak is STRICTLY stronger: last holds a 4-cell
    line at x=0 (truth target) and a taller block at x=+6 (alias target);
    curr holds a 5-cell line at x=-0.3. Shift +0.3 overlaps 4 cells, shift
    +6.3 overlaps 5 — the unwindowed argmax must take the alias, and the
    plausibility window (pred within 0.4 m) must take the truth
    (odometry/bev_init.py::bev_pose_init)."""
    from ssf_slam_tpu.odometry.bev_init import bev_pose_init

    cell = 0.25

    def line(x0, ys):
        return np.array([[x0, y, 0.0] for y in ys], np.float32)

    ys5 = np.arange(5) * cell + 0.1
    last = np.concatenate([line(0.1, ys5[:4]), line(6.1, ys5)])
    curr = line(0.1 - 0.3, ys5)
    last_m = jnp.ones(len(last), bool)
    curr_m = jnp.ones(len(curr), bool)

    # no window: alias wins (documents that the scene really aliases)
    dyaw, t = bev_pose_init(jnp.asarray(curr), curr_m, jnp.asarray(last),
                            last_m)
    assert abs(float(t[0]) - 6.3) < 0.2, np.asarray(t)

    # dynamics window around the constant-velocity prediction: truth wins
    pred = jnp.array([0.3, 0.0, 0.0])
    dyaw, t = bev_pose_init(jnp.asarray(curr), curr_m, jnp.asarray(last),
                            last_m, pred_t=pred, plaus_gate=0.4,
                            plaus_rel=0.5)
    assert abs(float(t[0]) - 0.3) < 0.2, np.asarray(t)
    assert abs(float(t[1])) < 0.2

    # no-velocity standstill: the window is bypassed (the global argmax is
    # the stale-warm-start rescue there) — alias returns
    dyaw, t = bev_pose_init(jnp.asarray(curr), curr_m, jnp.asarray(last),
                            last_m, pred_t=jnp.zeros(3), plaus_gate=0.4,
                            plaus_rel=0.5)
    assert abs(float(t[0]) - 6.3) < 0.2, np.asarray(t)


def test_trim_static_mask_drops_leaked_movers():
    """A mover bloc mislabeled static must be trimmed before anchoring
    geometry: its flow disagrees with the fitted rigid motion by its own
    per-frame displacement (odometry/egomotion.py::trim_static_mask)."""
    from ssf_slam_tpu.odometry.egomotion import trim_static_mask
    from ssf_slam_tpu.ops.se3 import quat_rotate

    rng = np.random.default_rng(3)
    n_static, n_mover = 900, 100
    pts = rng.uniform(-20, 20, (n_static + n_mover, 3)).astype(np.float32)
    q_true = jnp.array([0.0, 0.0, 0.02, 1.0])
    q_true = q_true / jnp.linalg.norm(q_true)
    t_true = jnp.array([0.8, 0.05, 0.0])
    pts_j = jnp.asarray(pts)
    # trim's rigid model: pred = R(pts+flow)+t, resid = pts - pred. Build
    # flow so it holds exactly for statics: flow = R^T(pts - t) - pts.
    q_conj = q_true * jnp.array([-1.0, -1, -1, 1])
    flow = quat_rotate(q_conj[None], pts_j - t_true[None]) - pts_j
    # movers: add a coherent extra displacement
    flow = flow.at[n_static:].add(jnp.array([0.6, 0.0, 0.0]))
    static = jnp.ones(len(pts), bool)  # the LEAKED mask: movers included
    trimmed = trim_static_mask(pts_j, flow, static, q_true, t_true,
                               max_resid=0.15)
    tr = np.asarray(trimmed)
    assert tr[:n_static].all()
    assert not tr[n_static:].any()
