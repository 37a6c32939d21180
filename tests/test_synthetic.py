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


def test_hybrid_fg_oversample():
    """hybrid FG/BG sampling (carla.py:179-200 parity) raises the moving
    fraction in generated training frames without touching eval frames."""
    plain = generate_sequence(n_frames=2, n_points=4096, seed=11, n_moving=4)
    hybrid = generate_sequence(n_frames=2, n_points=4096, seed=11, n_moving=4,
                               fg_oversample=512)
    frac_plain = np.mean([f["s_fg_mask"].sum() / f["mask1"].sum()
                          for f in plain])
    frac_hybrid = np.mean([f["s_fg_mask"].sum() / f["mask1"].sum()
                           for f in hybrid])
    assert frac_hybrid > frac_plain
    # target honored when enough movers are visible; never exceeded
    for f in hybrid:
        assert f["s_fg_mask"].sum() <= 512 + 1e-6
    # flow invariant still holds on the oversampled frames: static points'
    # gt equals the rigid ego-flow
    f = hybrid[1]
    static = (f["s_fg_mask"] < 0.5) & f["mask1"]
    np.testing.assert_allclose(f["gt"][static], f["ego_flow"][static],
                               atol=1e-5)


def test_mover_speed_and_crossing():
    slow = generate_sequence(n_frames=1, n_points=2048, seed=5, n_moving=6,
                             mover_speed=(0.5, 1.5), crossing_frac=1.0)
    # crossing movers: gt - ego_flow of moving points has a lateral (y)
    # component comparable to its x component
    f = slow[0]
    mov = f["s_fg_mask"] > 0.5
    if mov.sum() > 10:
        obj = f["gt"][mov] - f["ego_flow"][mov]
        assert np.abs(obj[:, 1]).mean() > 0.2 * np.abs(obj[:, 0]).mean()
        # slow movers: object displacement bounded by speed * dt
        assert np.linalg.norm(obj, axis=1).max() < 1.5 * 0.1 + 0.05
