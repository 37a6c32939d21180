"""Tests for the synthetic CARLA-style sequence generator."""

import numpy as np

from ssf_slam_tpu.data.synthetic import SyntheticWorld, generate_sequence, simulate_scan


def test_scan_geometry():
    rng = np.random.default_rng(0)
    world = SyntheticWorld.traffic_scene(rng, n_static=5, n_moving=0)
    pts, mask, oid = simulate_scan(world, np.array([0.0, 0, 1.8]), 0.0, 0.0)
    assert mask.sum() > 2000
    # downward rings must hit the ground near z = -1.8 (sensor frame)
    ground = mask & (oid == -1) & (pts[:, 2] < -0.5)
    assert ground.sum() > 500
    np.testing.assert_allclose(pts[ground][:, 2], -1.8, atol=0.05)


def test_flow_invariant_static_points():
    """pos1 + gt must equal the rigid warp of static points into frame 2."""
    frames = generate_sequence(n_frames=3, n_points=4096, seed=1, n_moving=2)
    f = frames[1]
    static = (f["s_fg_mask"] < 0.5) & f["mask1"].astype(bool)
    r1, t1 = f["pose1"]
    r2, t2 = f["pose2"]
    pw = f["pos1"][static] @ r1.T + t1
    expect = (pw - t2) @ r2
    np.testing.assert_allclose(
        f["pos1"][static] + f["gt"][static], expect, atol=1e-4
    )
    # ego_flow equals gt on static points
    np.testing.assert_allclose(f["ego_flow"][static], f["gt"][static], atol=1e-5)


def test_moving_objects_have_different_flow():
    frames = generate_sequence(n_frames=3, n_points=8192, seed=2, n_moving=3)
    found = False
    for f in frames:
        fg = f["s_fg_mask"] > 0.5
        if fg.sum() > 10:
            diff = np.linalg.norm(f["gt"][fg] - f["ego_flow"][fg], axis=1)
            assert diff.mean() > 0.1  # objects move >= 0.3 m/s * dt
            found = True
    assert found, "no moving-object points in any frame"


def test_sequence_deterministic():
    a = generate_sequence(n_frames=2, n_points=1024, seed=7)
    b = generate_sequence(n_frames=2, n_points=1024, seed=7)
    np.testing.assert_array_equal(a[0]["pos1"], b[0]["pos1"])
    np.testing.assert_array_equal(a[1]["gt"], b[1]["gt"])


def test_npz_roundtrip(tmp_path):
    from ssf_slam_tpu.data.carla import CarlaSceneFlowDataset, save_sequence_npz

    frames = generate_sequence(n_frames=4, n_points=2048, seed=3)
    save_sequence_npz(frames, str(tmp_path))
    ds = CarlaSceneFlowDataset(str(tmp_path), n_points=1024)
    assert len(ds) == 4
    item = ds[0]
    assert item["pos1"].shape == (1024, 3)
    assert item["gt"].shape == (1024, 3)
    assert item["mask1"].all()  # 2048 -> 1024 subsample, all valid
    batch = next(ds.batches(2, shuffle=False))
    assert batch["pos1"].shape == (2, 1024, 3)
