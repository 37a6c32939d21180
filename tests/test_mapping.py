"""Mapping back-end tests: ICP, pose graph, keyframe state machine."""

import jax.numpy as jnp
import numpy as np
import pytest

from ssf_slam_tpu.config import MappingConfig
from ssf_slam_tpu.mapping import init_map_state, mapping_step, solve_pose_graph
from ssf_slam_tpu.ops.icp import icp_point_to_point
from ssf_slam_tpu.ops.se3 import (
    quat_from_rpy,
    quat_identity,
    quat_multiply,
    quat_rotate,
    so3_exp_quat,
)

SMALL = MappingConfig(
    max_keyframes=32,
    submap_points=2048,
    icp_iters=15,
    loop_submap_halfwidth=3,
)


def test_icp_recovers_offset():
    rng = np.random.default_rng(0)
    # structured scene: two walls + ground patch (full 6-DoF constraint)
    a = rng.uniform([-10, -10, 0], [10, 10, 0.01], (800, 3))
    b = rng.uniform([-10, -0.01, 0], [10, 0.01, 8], (500, 3))
    c = rng.uniform([-0.01, -10, 0], [0.01, 10, 8], (500, 3))
    tgt = np.concatenate([a, b, c]).astype(np.float32)
    yaw = 0.05
    cz, sz = np.cos(yaw), np.sin(yaw)
    r_true = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]], np.float32)
    t_true = np.array([0.4, -0.3, 0.1], np.float32)
    # source = inverse-transformed target: r @ src + t = tgt
    src = (tgt - t_true) @ r_true
    r, t, fit = icp_point_to_point(
        jnp.asarray(src), jnp.asarray(tgt),
        jnp.ones(len(src), bool), jnp.ones(len(tgt), bool),
        max_corr_dist=5.0, iters=20,
    )
    np.testing.assert_allclose(np.asarray(r), r_true, atol=2e-3)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=2e-2)
    assert float(fit) < 0.05


def _chain_poses(n, step_t, step_yaw):
    """Compose a chain of identical relative motions."""
    qs, ts = [quat_identity()], [jnp.zeros(3)]
    rel_q = quat_from_rpy(jnp.float32(0), jnp.float32(0), jnp.float32(step_yaw))
    for _ in range(n - 1):
        q = quat_multiply(qs[-1], rel_q)
        t = ts[-1] + quat_rotate(qs[-1], jnp.asarray(step_t))
        qs.append(q)
        ts.append(t)
    return jnp.stack(qs), jnp.stack(ts)


def test_pose_graph_loop_correction():
    """A drifted chain with a loop factor back to node 0 must snap closed."""
    n, k = 12, 16
    true_q, true_t = _chain_poses(n, np.array([1.0, 0, 0], np.float32), 2 * np.pi / n)
    # odometry measurements: true relative motion (perfect odometry)
    rel_q_list = [quat_identity()]
    rel_t_list = [jnp.zeros(3)]
    for i in range(1, n):
        from ssf_slam_tpu.ops.se3 import pose_between

        rq, rt = pose_between((true_q[i - 1], true_t[i - 1]), (true_q[i], true_t[i]))
        rel_q_list.append(rq)
        rel_t_list.append(rt)

    # corrupt the estimate: accumulate drift on nodes 6+
    drift = so3_exp_quat(jnp.array([0, 0, 0.1]))
    est_q = true_q.at[6:].set(quat_multiply(drift[None], true_q[6:]))
    est_t = true_t.at[6:].add(jnp.array([0.8, -0.5, 0.2]))

    pad_q = jnp.tile(quat_identity(), (k, 1))
    pad_t = jnp.zeros((k, 3))
    q0 = pad_q.at[:n].set(est_q)
    t0 = pad_t.at[:n].set(est_t)
    orq = pad_q.at[:n].set(jnp.stack(rel_q_list))
    ort = pad_t.at[:n].set(jnp.stack(rel_t_list))
    active = jnp.arange(k) < n

    # loop factor: node n-1 relative to node 0 at the TRUE relative pose
    from ssf_slam_tpu.ops.se3 import pose_between

    lq, lt = pose_between((true_q[n - 1], true_t[n - 1]), (true_q[0], true_t[0]))
    loop_a = jnp.zeros(4, jnp.int32).at[0].set(n - 1)
    loop_b = jnp.zeros(4, jnp.int32)
    loop_rel_q = jnp.tile(quat_identity(), (4, 1)).at[0].set(lq)
    loop_rel_t = jnp.zeros((4, 3)).at[0].set(lt)
    loop_w = jnp.zeros(4).at[0].set(100.0)

    new_q, new_t = solve_pose_graph(
        q0, t0, active, orq, ort, loop_a, loop_b, loop_rel_q, loop_rel_t,
        loop_w, iters=10,
    )
    err_t = np.abs(np.asarray(new_t[:n]) - np.asarray(true_t)).max()
    assert err_t < 0.05, f"pose graph left {err_t} translation error"
    qdot = np.abs(np.sum(np.asarray(new_q[:n]) * np.asarray(true_q), axis=-1))
    assert qdot.min() > 1 - 1e-4


def test_pose_graph_without_loops_keeps_chain():
    n, k = 6, 8
    true_q, true_t = _chain_poses(n, np.array([1.0, 0.2, 0], np.float32), 0.1)
    rel_q = [quat_identity()]
    rel_t = [jnp.zeros(3)]
    from ssf_slam_tpu.ops.se3 import pose_between

    for i in range(1, n):
        rq, rt = pose_between((true_q[i - 1], true_t[i - 1]), (true_q[i], true_t[i]))
        rel_q.append(rq)
        rel_t.append(rt)
    q0 = jnp.tile(quat_identity(), (k, 1)).at[:n].set(true_q)
    t0 = jnp.zeros((k, 3)).at[:n].set(true_t)
    new_q, new_t = solve_pose_graph(
        q0, t0, jnp.arange(k) < n,
        jnp.tile(quat_identity(), (k, 1)).at[:n].set(jnp.stack(rel_q)),
        jnp.zeros((k, 3)).at[:n].set(jnp.stack(rel_t)),
        jnp.zeros(2, jnp.int32), jnp.zeros(2, jnp.int32),
        jnp.tile(quat_identity(), (2, 1)), jnp.zeros((2, 3)), jnp.zeros(2),
        iters=5,
    )
    np.testing.assert_allclose(np.asarray(new_t[:n]), np.asarray(true_t), atol=1e-4)


def test_mapping_step_keyframe_gating():
    cloud = jnp.asarray(
        np.random.default_rng(0).uniform(-10, 10, (256, 3)), jnp.float32
    )
    mask = jnp.ones(256, bool)
    state = init_map_state(SMALL.max_keyframes, 256)
    qid = quat_identity()

    # frame 0 always becomes a keyframe
    state, out = mapping_step(state, qid, jnp.zeros(3), cloud, mask,
                              jnp.float32(0.0), SMALL)
    assert bool(out["is_keyframe"]) and int(state.n_kf) == 1
    # tiny motion -> no keyframe
    state, out = mapping_step(state, qid, jnp.array([0.1, 0, 0.0]), cloud,
                              mask, jnp.float32(0.1), SMALL)
    assert not bool(out["is_keyframe"]) and int(state.n_kf) == 1
    np.testing.assert_allclose(np.asarray(out["pose_t"]), [0.1, 0, 0], atol=1e-6)
    # 1.5 m motion -> keyframe
    state, out = mapping_step(state, qid, jnp.array([1.5, 0, 0.0]), cloud,
                              mask, jnp.float32(0.2), SMALL)
    assert bool(out["is_keyframe"]) and int(state.n_kf) == 2
    np.testing.assert_allclose(np.asarray(state.kf_t[1]), [1.5, 0, 0], atol=1e-6)


@pytest.mark.filterwarnings("ignore")
def test_mapping_closes_loop_on_revisit():
    """Drifted odometry revisiting the start must trigger ICP + correction."""
    rng = np.random.default_rng(1)
    # world cloud: box corner geometry for ICP stability
    a = rng.uniform([-15, -15, -0.05], [15, 15, 0.05], (400, 3))
    b = rng.uniform([-15, 14.9, 0], [15, 15.1, 6], (300, 3))
    c = rng.uniform([14.9, -15, 0], [15.1, 15, 6], (300, 3))
    world = np.concatenate([a, b, c]).astype(np.float32)

    # radius/time gates scaled to this miniature 40 m loop: only the true
    # revisit (frame 20 near frame 0) may qualify
    cfg = MappingConfig(
        max_keyframes=32, submap_points=2048, icp_iters=20,
        loop_submap_halfwidth=3, loop_search_radius=4.0, loop_time_gap=5.0,
        loop_min_keyframes=4,
    )
    state = init_map_state(cfg.max_keyframes, len(world))
    mask = jnp.ones(len(world), bool)

    # square loop trajectory, 2 m steps; drift injected on the way
    n_side = 5
    waypoints = []
    for s, d in (((0, 0), (2, 0)), ((10, 0), (0, 2)), ((10, 10), (-2, 0)),
                 ((0, 10), (0, -2))):
        for i in range(n_side):
            waypoints.append(np.array([s[0] + d[0] * i, s[1] + d[1] * i, 0.0]))
    waypoints.append(np.array([0.0, 0.0, 0.0]))  # revisit start

    drift = np.array([0.04, -0.03, 0.0], np.float32)  # per-step odom drift
    qid = quat_identity()
    closed = False
    for k, w in enumerate(waypoints):
        true_t = w.astype(np.float32)
        odom_t = true_t + drift * k
        # keyframe cloud: world seen from the TRUE pose (identity rotation)
        cloud = jnp.asarray(world - true_t)
        state, out = mapping_step(
            state, qid, jnp.asarray(odom_t), cloud, mask,
            jnp.float32(k * 1.0), cfg,
        )
        if int(state.n_loops) > 0:
            closed = True
    assert closed, "no loop closure fired on revisit"
    # after closure the final pose must be pulled toward the true position
    final_err = np.linalg.norm(np.asarray(state.cur_t) - waypoints[-1])
    drift_err = np.linalg.norm(drift * (len(waypoints) - 1))
    assert final_err < drift_err * 0.5, (final_err, drift_err)


def test_scan_to_map_refine_corrects_drift():
    """Opt-in scan-to-submap refinement (MappingConfig.scan_to_map_refine):
    a keyframe arriving with a drifted odometry pose is point-to-plane
    registered against the recent keyframe submap and most of the drift is
    folded into the loop-adjust transform. Static world only — see the
    config docstring for the measured mover caveat."""
    import dataclasses

    from ssf_slam_tpu.odometry.scan2map import fit_local_planes

    rng = np.random.default_rng(3)
    # static world: ground plane + two walls (well-conditioned for planes)
    n = 768
    ground = np.stack([rng.uniform(-20, 20, n), rng.uniform(-20, 20, n),
                       np.zeros(n)], 1)
    wall1 = np.stack([rng.uniform(-20, 20, n // 2), np.full(n // 2, 8.0),
                      rng.uniform(0, 4, n // 2)], 1)
    wall2 = np.stack([np.full(n // 2, 12.0), rng.uniform(-20, 20, n // 2),
                      rng.uniform(0, 4, n // 2)], 1)
    world = np.concatenate([ground, wall1, wall2]).astype(np.float32)
    world += rng.normal(0, 0.003, world.shape).astype(np.float32)

    cfg = dataclasses.replace(SMALL, scan_to_map_refine=True,
                              enable_loop_closure=False,
                              refine_min_keyframes=2)
    f = world.shape[0]
    mask = jnp.ones(f, bool)
    qid = quat_identity()
    state = init_map_state(cfg.max_keyframes, f)

    def sensor_cloud(t):
        # world points expressed in a sensor at position t (identity rot)
        return jnp.asarray(world - np.asarray(t)[None], jnp.float32)

    # two clean keyframes establish the submap
    for k, pos in enumerate(([0.0, 0, 0], [1.5, 0, 0])):
        pos = np.array(pos, np.float32)
        state, _ = mapping_step(
            state, qid, jnp.asarray(pos), sensor_cloud(pos), mask,
            jnp.float32(k), cfg,
            cloud_planes=fit_local_planes(sensor_cloud(pos), mask),
        )
    assert int(state.n_kf) == 2

    # third keyframe: true sensor position 3.0, odometry claims 3.25 —
    # the refinement must pull the recorded pose back toward truth
    true_pos = np.array([3.0, 0, 0], np.float32)
    drifted = jnp.asarray([3.25, 0.15, 0.0])
    cloud = sensor_cloud(true_pos)
    state, out = mapping_step(
        state, qid, drifted, cloud, mask, jnp.float32(2.0), cfg,
        cloud_planes=fit_local_planes(cloud, mask),
    )
    assert int(state.n_kf) == 3
    err_before = np.linalg.norm(np.asarray(drifted) - true_pos)
    err_after = np.linalg.norm(np.asarray(state.kf_t[2]) - true_pos)
    # The refinement is a DAMPER, not a snap-to-truth: its strong prior
    # (anchored at the incoming pose) deliberately limits each correction
    # so unobserved directions never move, and corrections compound across
    # keyframe events. One event recovers ~half the drift here.
    assert err_after < 0.7 * err_before, (err_before, err_after)
    # the correction rode into the adjust transform for subsequent frames
    corr = np.asarray(state.adjust_t)
    drift_vec = np.asarray(drifted) - true_pos
    assert np.dot(corr, -drift_vec) > 0.3 * err_before**2, (corr, drift_vec)


def _run_multi_revisit(max_loops, n_laps=3, drift_xy=(0.03, -0.02)):
    """Drive mapping_step around a square circuit ``n_laps`` times with
    constant per-step odometry drift. Every lap revisits every corner, so
    multiple loop factors accumulate and INTERACT in the batch GN solve
    (the reference's iSAM2 handles this incrementally and unboundedly,
    src/mapOptmization.cpp:280-293). Returns (state, per-step error trace,
    closure-event step indices)."""
    rng = np.random.default_rng(7)
    a = rng.uniform([-18, -18, -0.05], [18, 18, 0.05], (400, 3))
    b = rng.uniform([-18, 17.9, 0], [18, 18.1, 6], (300, 3))
    d = rng.uniform([17.9, -18, 0], [18.1, 18, 6], (300, 3))
    world = np.concatenate([a, b, d]).astype(np.float32)

    cfg = MappingConfig(
        max_keyframes=128, submap_points=2048, icp_iters=20,
        loop_submap_halfwidth=2, loop_search_radius=3.0, loop_time_gap=5.0,
        loop_min_keyframes=4, loop_skip_after_close=6,
        loop_skip_after_detect=1,
    )
    state = init_map_state(cfg.max_keyframes, len(world),
                           max_loops=max_loops)
    mask = jnp.ones(len(world), bool)

    lap = []
    n_side = 5
    for s, dd in (((0, 0), (2, 0)), ((10, 0), (0, 2)), ((10, 10), (-2, 0)),
                  ((0, 10), (0, -2))):
        for i in range(n_side):
            lap.append(np.array([s[0] + dd[0] * i, s[1] + dd[1] * i, 0.0]))
    waypoints = lap * n_laps + [np.array([0.0, 0.0, 0.0])]

    drift = np.array([drift_xy[0], drift_xy[1], 0.0], np.float32)
    qid = quat_identity()
    errs, closures = [], []
    prev_loops = 0
    for k, w in enumerate(waypoints):
        true_t = w.astype(np.float32)
        odom_t = true_t + drift * k
        cloud = jnp.asarray(world - true_t)
        state, out = mapping_step(
            state, qid, jnp.asarray(odom_t), cloud, mask,
            jnp.float32(k * 1.0), cfg,
        )
        errs.append(float(np.linalg.norm(np.asarray(out["pose_t"]) - true_t)))
        total = int(state.n_loops_total)
        if total > prev_loops:
            closures.append(k)
            prev_loops = total
    return state, np.asarray(errs), closures


def test_multi_loop_figure_circuit():
    """>=3 interacting loop factors over repeated revisits: every closure
    must REDUCE the pose error, corrections must compound through
    adjust_q/t, and the final pose must hold most of the drift at bay."""
    state, errs, closures = _run_multi_revisit(max_loops=32)
    assert len(closures) >= 3, f"only {len(closures)} closures fired"
    assert int(state.n_loops_total) == int(state.n_loops) >= 3
    for k in closures:
        # the ICP correction lands through adjust_q/t (trans_loop_adjust,
        # mapOptmization.cpp:327,450): every pose FROM THE NEXT FRAME ON
        # inherits it, so compare the post-closure frame against the error
        # the drifted odometry alone would have accumulated there
        if k + 1 >= len(errs):
            continue
        drift_err = np.linalg.norm([0.03, -0.02]) * (k + 1)
        assert errs[k + 1] < 0.6 * drift_err, (k, errs[k + 1], drift_err)
    # the LAST pose (a revisit of the start after 3 laps of drift) stays
    # bounded: without closures the drift would be ~2.2 m
    raw_drift = np.linalg.norm([0.03, -0.02]) * (len(errs) - 1)
    assert errs[-1] < 0.35 * raw_drift, (errs[-1], raw_drift)
    # interacting factors span different laps (distinct source keyframes
    # closing onto overlapping candidates)
    la = np.asarray(state.loop_a)[: int(state.n_loops)]
    assert len(np.unique(la)) == len(la) >= 3


def test_loop_buffer_saturation_keeps_best():
    """With a 2-slot factor buffer the third+ closures must still fire
    (replace-weakest, never silent-stop) and the graph must keep
    correcting — the round-3 behavior froze loop detection at the cap."""
    state, errs, closures = _run_multi_revisit(max_loops=2)
    total = int(state.n_loops_total)
    assert total >= 3, f"saturation stopped closures (total={total})"
    assert int(state.n_loops) == 2
    w = np.asarray(state.loop_w)
    assert (w > 0).all(), "saturated buffer left an empty slot"
    # correction quality survives saturation: final revisit error bounded
    raw_drift = np.linalg.norm([0.03, -0.02]) * (len(errs) - 1)
    assert errs[-1] < 0.5 * raw_drift, (errs[-1], raw_drift)
