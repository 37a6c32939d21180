"""Tests for pose utils, calibration, and GT scene-flow generation."""

import numpy as np
import pytest


def _yaw(a):
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]])


def test_kitti_pose_roundtrip(tmp_path):
    from ssf_slam_tpu.utils.poses import read_kitti_poses, write_kitti_poses

    rng = np.random.default_rng(0)
    mats = np.tile(np.eye(4), (5, 1, 1))
    for m in mats:
        m[:3, :3] = _yaw(rng.uniform(-1, 1))
        m[:3, 3] = rng.normal(size=3)
    path = str(tmp_path / "poses.txt")
    write_kitti_poses(path, mats)
    back = read_kitti_poses(path)
    np.testing.assert_allclose(back, mats, atol=1e-5)


def test_tum_to_kitti(tmp_path):
    from ssf_slam_tpu.engine.evaluation import write_tum
    from ssf_slam_tpu.utils.poses import read_kitti_poses, tum_file_to_kitti

    tum = str(tmp_path / "a.tum")
    write_tum(tum, [0.0, 1.0], [[1, 2, 3], [4, 5, 6]],
              [[0, 0, 0, 1], [0, 0, 0, 1]])
    kitti = str(tmp_path / "a.kitti")
    tum_file_to_kitti(tum, kitti)
    mats = read_kitti_poses(kitti)
    np.testing.assert_allclose(mats[1][:3, 3], [4, 5, 6], atol=1e-5)


def test_calibration(tmp_path):
    from ssf_slam_tpu.utils.calibration import Calibration

    path = tmp_path / "calib.txt"
    path.write_text(
        "P2: 700 0 600 0 0 700 200 0 0 0 1 0\n"
        "R0_rect: 1 0 0 0 1 0 0 0 1\n"
        "Tr_velo_to_cam: 0 -1 0 0 0 0 -1 0 1 0 0 0\n"
    )
    cal = Calibration.from_file(str(path))
    velo = np.array([[10.0, 2.0, 1.0]])
    cam = cal.velo_to_cam(velo)
    np.testing.assert_allclose(cam, [[-2.0, -1.0, 10.0]], atol=1e-6)
    back = cal.cam_to_velo(cam)
    np.testing.assert_allclose(back, velo, atol=1e-5)
    uv = cal.project_to_image(velo)
    assert uv.shape == (1, 2)


def test_pairwise_scene_flow_static():
    from ssf_slam_tpu.data.sceneflow_gen import compute_pairwise_scene_flow

    rng = np.random.default_rng(1)
    pts1 = rng.uniform(-20, 20, (500, 3)).astype(np.float32)
    r1, t1 = _yaw(0.1), np.array([1.0, 2.0, 0.0])
    r2, t2 = _yaw(0.15), np.array([2.0, 2.5, 0.0])
    gt, ego, fg = compute_pairwise_scene_flow(pts1, r1, t1, r2, t2)
    # static: gt == ego, and pos1+gt in frame2 equals the world point
    np.testing.assert_allclose(gt, ego, atol=1e-6)
    pw = pts1 @ r1.T + t1
    np.testing.assert_allclose((pts1 + gt) @ r2.T + t2, pw, atol=1e-4)
    assert fg.sum() == 0


def test_pairwise_scene_flow_moving_object():
    from ssf_slam_tpu.data.sceneflow_gen import (
        ObjectTrack,
        compute_pairwise_scene_flow,
    )

    pts1 = np.array([[5.0, 0.0, 0.5], [15.0, 0.0, 0.5]], np.float32)
    eye = np.eye(3)
    obj = ObjectTrack(
        center1=np.array([5.0, 0, 0.5]), size=np.array([2.0, 2.0, 2.0]),
        yaw1=0.0, center2=np.array([7.0, 0, 0.5]), yaw2=0.0,
    )
    gt, ego, fg = compute_pairwise_scene_flow(
        pts1, eye, np.zeros(3), eye, np.zeros(3), [obj]
    )
    np.testing.assert_allclose(gt[0], [2.0, 0, 0], atol=1e-5)  # carried along
    np.testing.assert_allclose(gt[1], 0.0, atol=1e-6)  # static point
    assert fg.tolist() == [1.0, 0.0]


def test_coarse_bev_flow_recovers_shift():
    from ssf_slam_tpu.data.sceneflow_gen import coarse_bev_flow

    rng = np.random.default_rng(2)
    pts1 = rng.uniform(-20, 20, (2000, 3)).astype(np.float32)
    pts1[:, 2] = 1.0
    shift = np.array([3.0, -2.0, 0.0], np.float32)
    pts2 = pts1 + shift
    flow = coarse_bev_flow(pts1, pts2, cell=1.0, search=5)
    # weakly-textured uniform points mismatch in flat regions; the MODE of
    # the per-cell estimates must still be the true shift
    def mode(v):
        vals, counts = np.unique(v, return_counts=True)
        return vals[np.argmax(counts)]

    assert mode(flow[:, 0]) == pytest.approx(shift[0], abs=1.01)
    assert mode(flow[:, 1]) == pytest.approx(shift[1], abs=1.01)
