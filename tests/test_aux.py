"""Tests for aux subsystems: transforms, viz, HPR, set-cover, logging,
SLAM checkpoint/resume."""

import json
import os

import numpy as np
import pytest


def test_augment_preserves_flow_geometry():
    from ssf_slam_tpu.data.transforms import AugmentConfig, augment_pair

    rng = np.random.default_rng(0)
    pos1 = rng.uniform(-10, 10, (500, 3)).astype(np.float32)
    gt = rng.normal(size=(500, 3)).astype(np.float32)
    frame = dict(pos1=pos1, pos2=pos1 + gt, gt=gt)
    cfg = AugmentConfig(jitter_sigma=0.0)  # exact check needs no jitter
    out = augment_pair(frame, rng, cfg)
    # warped landing spot must match transformed pos2 distribution:
    # pos1' + gt' == A(pos1+gt) + t == transform of (pos1+gt)
    np.testing.assert_allclose(
        out["pos1"] + out["gt"], out["pos2"], atol=1e-4
    )


def test_flow_color_and_bev():
    from ssf_slam_tpu.utils.viz import bev_image, flow_to_color, segmentation_panel

    rng = np.random.default_rng(1)
    flow = rng.normal(size=(100, 2))
    colors = flow_to_color(flow)
    assert colors.shape == (100, 3) and colors.dtype == np.uint8
    pts = rng.uniform(-50, 50, (1000, 3))
    img = bev_image(pts, resolution=64)
    assert img.shape == (64, 64, 3) and img.sum() > 0
    panel = segmentation_panel(pts, {"a": pts[:, 0] > 0, "b": pts[:, 1] > 0},
                               resolution=32)
    assert panel.shape == (32, 64, 3)


def test_hidden_point_removal():
    from ssf_slam_tpu.ops.hpr import hidden_point_removal

    # a dense wall at x=5 occludes points directly behind it at x=10
    g = np.linspace(-3, 3, 40)
    yy, zz = np.meshgrid(g, g)
    wall = np.stack([np.full(yy.size, 5.0), yy.ravel(), zz.ravel()], 1)
    g2 = np.linspace(-1.5, 1.5, 10)
    y2, z2 = np.meshgrid(g2, g2)
    behind = np.stack([np.full(y2.size, 10.0), y2.ravel(), z2.ravel()], 1)
    pts = np.concatenate([wall, behind])
    vis = hidden_point_removal(pts, np.zeros(3))
    assert vis[: len(wall)].mean() > 0.3  # wall front largely visible
    assert vis[len(wall):].mean() < 0.1  # shadowed points removed


def test_set_cover_next_best_view():
    from ssf_slam_tpu.data.setcover import PositionSelector

    rng = np.random.default_rng(3)
    # two clusters far apart; best second view must cover the other cluster
    a = rng.uniform(-2, 2, (300, 3)) + np.array([20, 0, 0])
    b = rng.uniform(-2, 2, (300, 3)) + np.array([-20, 0, 0])
    pts = np.concatenate([a, b])
    sel = PositionSelector(pts, max_range=15.0)
    cands = np.array([[20, 5, 1], [-20, 5, 1]], float)
    i1, v1 = sel.next_best_view(cands)
    i2, v2 = sel.next_best_view(cands)
    assert {i1, i2} == {0, 1}
    assert v1 > 0 and v2 > 0


def test_run_logger(tmp_path):
    from ssf_slam_tpu.config import PipelineConfig
    from ssf_slam_tpu.utils.logging import RunLogger

    lg = RunLogger(str(tmp_path))
    lg.cprint("hello")
    lg.metrics(1, loss=0.5, epe=0.1)
    lg.snapshot_config(PipelineConfig())
    lg.close()
    assert "hello" in open(tmp_path / "run.log").read()
    rec = json.loads(open(tmp_path / "metrics.jsonl").read().strip())
    assert rec["loss"] == 0.5
    cfg = json.load(open(tmp_path / "config.json"))
    assert cfg["lidar"]["n_scan_rows"] == 16


def test_slam_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    from ssf_slam_tpu.config import FeatureConfig, MappingConfig, PipelineConfig, Variant
    from ssf_slam_tpu.data.synthetic import generate_sequence
    from ssf_slam_tpu.engine import run_sequence
    from ssf_slam_tpu.engine.checkpoint import load_slam_state, save_slam_state

    cfg = PipelineConfig(
        variant=Variant.SEG,
        features=FeatureConfig(max_features=512),
        mapping=MappingConfig(max_keyframes=16, submap_points=512,
                              icp_iters=4, loop_submap_halfwidth=2),
    )
    seq = generate_sequence(n_frames=4, n_points=8192, seed=5)
    state, outs = run_sequence(seq, cfg)
    path = str(tmp_path / "ckpt")
    save_slam_state(path, state, scan_index=4)
    restored, idx = load_slam_state(path, cfg)
    assert idx == 4
    np.testing.assert_allclose(
        np.asarray(restored.odom_t), np.asarray(state.odom_t)
    )
    assert int(restored.map_state.n_kf) == int(state.map_state.n_kf)


def test_label_weights():
    from ssf_slam_tpu.data.carla import compute_label_weights

    class FakeDs:
        def __len__(self):
            return 2

        def __getitem__(self, i):
            fg = np.zeros(100, np.float32)
            fg[:10] = 1.0  # 10% movers
            return dict(s_fg_mask=fg, mask1=np.ones(100, bool))

    w = compute_label_weights(FakeDs())
    assert w.shape == (2,)
    assert w[1] > w[0]  # rare class weighted higher


def test_project_labels_to_bev():
    from ssf_slam_tpu.utils.viz import project_labels_to_bev

    pts = np.array([[10.0, 10.0, 0], [-10.0, -10.0, 0]])
    labels = np.array([1, 0])
    img = project_labels_to_bev(pts, labels, extent=20, resolution=8)
    assert set(np.unique(img)) == {0, 1, 255}


def test_write_ply_and_map_export(tmp_path):
    """PLY export: parseable header, exact binary payload; map_to_ply
    aggregates keyframe clouds with optimized poses + red trajectory."""
    import numpy as np

    from ssf_slam_tpu.utils.viz import map_to_ply, write_ply

    pts = np.arange(12, dtype=np.float32).reshape(4, 3)
    cols = np.full((4, 3), 7, np.uint8)
    p = str(tmp_path / "a.ply")
    write_ply(p, pts, cols)
    data = open(p, "rb").read()
    hdr, _, body = data.partition(b"end_header\n")
    assert b"element vertex 4" in hdr
    rec = np.frombuffer(body, dtype=[("xyz", np.float32, 3),
                                     ("rgb", np.uint8, 3)])
    np.testing.assert_array_equal(rec["xyz"], pts)
    np.testing.assert_array_equal(rec["rgb"], cols)

    # tiny map: two keyframes, one rotated 90 deg about z
    import jax.numpy as jnp

    from ssf_slam_tpu.mapping.keyframes import init_map_state

    st = init_map_state(4, 8)
    cloud = np.zeros((3, 8), np.float32)
    cloud[0] = 1.0  # all points at x=1
    # quats are [x, y, z, w] (ops/se3.py); 90 deg about z
    q90 = np.array([0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)], np.float32)
    st = st._replace(
        n_kf=jnp.int32(2),
        kf_cloud=st.kf_cloud.at[0].set(cloud).at[1].set(cloud),
        kf_cloud_mask=st.kf_cloud_mask.at[:2].set(True),
        kf_q=st.kf_q.at[0].set(jnp.array([0.0, 0, 0, 1.0])).at[1].set(
            jnp.asarray(q90)),
        kf_t=st.kf_t.at[1].set(jnp.array([5.0, 0, 0])),
    )
    m = str(tmp_path / "map.ply")
    n = map_to_ply(st, m)
    assert n >= 16
    data = open(m, "rb").read()
    body = data.partition(b"end_header\n")[2]
    rec = np.frombuffer(body, dtype=[("xyz", np.float32, 3),
                                     ("rgb", np.uint8, 3)])
    # kf0 points at (1,0,0); kf1 points rotated to (0,1,0) + t=(5,0,0)
    xyz = rec["xyz"]
    assert (np.abs(xyz[:8] - [1, 0, 0]) < 1e-5).all()
    assert (np.abs(xyz[8:16] - [5, 1, 0]) < 1e-5).all()
