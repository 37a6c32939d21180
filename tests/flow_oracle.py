"""INDEPENDENT ground-truth scene-flow oracle (spec transcription).

This is a deliberate, textually-separate transcription of the reference's
flow EQUATIONS — Generate_Sceneflow.py:432 (rigid ego warp) and :498-523
(per-vehicle bbox delta translation + rotation about the target box
center) — kept apart from ``ssf_slam_tpu/data/sceneflow_gen.py`` so the two
implementations share no code and no derivation:

- the production module re-poses each object point through its OBJECT-LOCAL
  coordinates (local = (p_w - c1) @ Ryaw1; moved = local @ Ryaw2^T + c2);
- this oracle follows the reference's sequential in-place edit of the
  warped array: ``arr_ = (arr @ src_R_inv.T + t_src - t_tgt) @ tgt_R.T``,
  then for each tracked object ``arr_[inside] += delta_flow`` where
  ``delta_flow = (c2_s2 - c1_s1) - rigid_warp_flow(c1_s1)``, then
  ``arr_[inside] = (arr_[inside] - c2_s2) @ Rdelta.T + c2_s2`` with Rdelta
  the frame-to-frame change of the box orientation as seen from the sensor
  (the Euler-delta ``(lcl_rot_tgt - obj_rot_tgt) - (lcl_rot_src -
  obj_rot_src)`` of Generate_Sceneflow.py:520-523, negated into the
  apparent-object-rotation convention; for the yaw-only scenes tested this
  is exact).

A convention bug shared between the production generator and the pipeline
(both written by this repo) would be invisible to every other test; this
oracle is the third vote. CARLA log-format artifacts in the reference
(axis flip ``*[1,-1,1]``, the ``-2.5`` z offset, regex parsing) are
deliberately NOT part of the math and are excluded.

Pose convention (same arguments as compute_pairwise_scene_flow): r1/r2 are
world-from-sensor rotations used as ``p_world = p_sensor @ r.T + t``;
the reference's ``src_R_inv`` equals r1 and ``tgt_R`` equals r2.T.
"""

from __future__ import annotations

import numpy as np


def _yaw_rot(yaw: float) -> np.ndarray:
    c, s = np.cos(yaw), np.sin(yaw)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def oracle_scene_flow(
    pts1: np.ndarray,
    r1: np.ndarray, t1: np.ndarray, yaw1: float,
    r2: np.ndarray, t2: np.ndarray, yaw2: float,
    objects: list,
) -> tuple[np.ndarray, np.ndarray]:
    """Returns (flow [N,3], fg_mask [N] bool) for frame-1 sensor points.

    ``objects`` is a list of sceneflow_gen.ObjectTrack (world-frame box
    center/yaw at both times + full extents); yaw1/yaw2 are the sensor's
    world yaws (the scenes under test are yaw-only, matching the planar
    vehicle motion the reference records).
    """
    arr = np.asarray(pts1, np.float64)

    def to_world_src(p):
        return p @ np.asarray(r1).T + t1

    def rigid_warp(p_sensor1):
        # Generate_Sceneflow.py:432 with src_R_inv = r1, tgt_R = r2.T:
        # arr_ = (arr @ src_R_inv.T + t_src - t_tgt) @ tgt_R.T
        return (p_sensor1 @ np.asarray(r1).T + t1 - t2) @ np.asarray(r2)

    arr_ = rigid_warp(arr)
    fg = np.zeros(len(arr), bool)

    for obj in objects:
        # box center observed in each frame's sensor coords
        # (bbox_center = lcl_R @ (oth_v_loc - lcl_trans), :486)
        c1_s = (np.asarray(obj.center1, np.float64) - t1) @ np.asarray(r1)
        c2_s = (np.asarray(obj.center2, np.float64) - t2) @ np.asarray(r2)

        # inside-test in the t1 SENSOR frame: box yaw as seen from the
        # sensor is (obj_yaw1 - sensor_yaw1)
        rel = (arr - c1_s) @ _yaw_rot(obj.yaw1 - yaw1)
        inside = np.all(np.abs(rel) <= np.asarray(obj.size) / 2 + 1e-6,
                        axis=1)
        if not inside.any():
            continue
        fg |= inside

        # :511-517  obj_flow = tgt_center - src_center;
        #           delta_flow = obj_flow - rigid_flow(src_center)
        obj_flow = c2_s - c1_s
        rigid_center_flow = rigid_warp(c1_s[None])[0] - c1_s
        delta_flow = obj_flow - rigid_center_flow
        arr_[inside] += delta_flow

        # :520-523  rotate about the TARGET box center. The reference's
        # Euler delta ``(lcl_rot_tgt - obj_rot_tgt) - (lcl_rot_src -
        # obj_rot_src)`` is expressed in CARLA's left-handed log convention
        # (note the axis flips at :470); in the right-handed yaw-only
        # setting here, z-rotations commute with the sensor yaws, the
        # sensor terms cancel through the rigid warp, and the residual
        # rotation is exactly the object's OWN yaw change:
        d_yaw = obj.yaw2 - obj.yaw1
        arr_[inside] = (arr_[inside] - c2_s) @ _yaw_rot(d_yaw).T + c2_s

    flow = arr_ - arr
    return flow.astype(np.float32), fg


def oracle_ate_rmse(est_pos: np.ndarray, ref_pos: np.ndarray) -> float:
    """INDEPENDENT ATE-RMSE oracle: Horn's closed-form quaternion absolute
    orientation (Horn 1987, JOSA A 4(4):629) instead of the engine's
    SVD-based Umeyama alignment — a different algorithm and a different
    code path for the same quantity (evo's own ATE definition:
    SE(3)-align, then RMSE of translation residuals). Used to cross-check
    ``ssf_slam_tpu.engine.evaluation.ate_rmse`` on committed trajectories,
    replacing the external ``evo`` package this image doesn't ship.
    """
    est = np.asarray(est_pos, np.float64)
    ref = np.asarray(ref_pos, np.float64)
    mu_e, mu_r = est.mean(0), ref.mean(0)
    e, r = est - mu_e, ref - mu_r
    # Horn: build the 4x4 symmetric N matrix from the correlation M
    m = e.T @ r
    sxx, sxy, sxz = m[0]
    syx, syy, syz = m[1]
    szx, szy, szz = m[2]
    n = np.array([
        [sxx + syy + szz, syz - szy, szx - sxz, sxy - syx],
        [syz - szy, sxx - syy - szz, sxy + syx, szx + sxz],
        [szx - sxz, sxy + syx, -sxx + syy - szz, syz + szy],
        [sxy - syx, szx + sxz, syz + szy, -sxx - syy + szz],
    ])
    w, v = np.linalg.eigh(n)
    qw, qx, qy, qz = v[:, np.argmax(w)]  # max-eigenvalue quaternion
    rot = np.array([
        [1 - 2 * (qy * qy + qz * qz), 2 * (qx * qy - qw * qz),
         2 * (qx * qz + qw * qy)],
        [2 * (qx * qy + qw * qz), 1 - 2 * (qx * qx + qz * qz),
         2 * (qy * qz - qw * qx)],
        [2 * (qx * qz - qw * qy), 2 * (qy * qz + qw * qx),
         1 - 2 * (qx * qx + qy * qy)],
    ])
    aligned = e @ rot.T + mu_r
    return float(np.sqrt(np.mean(np.sum((aligned - ref) ** 2, axis=1))))
