"""Pose-file parsing / conversion utilities.

Replaces utils/odom_utils.py (pose parsing + SE(3) helpers for the CARLA
recording workflow) and the evo-facing format conversions of the evaluation
protocol (README.md:64-72: TUM <-> KITTI trajectory formats).
"""

from __future__ import annotations

import numpy as np


def kitti_to_mat(line: str) -> np.ndarray:
    """One KITTI-odometry pose line (12 floats, row-major 3x4) -> 4x4."""
    vals = np.fromstring(line, sep=" ")
    m = np.eye(4)
    m[:3, :4] = vals.reshape(3, 4)
    return m


def mat_to_kitti(m: np.ndarray) -> str:
    return " ".join(f"{v:.6e}" for v in np.asarray(m)[:3, :4].reshape(-1))


def read_kitti_poses(path: str) -> np.ndarray:
    """[N, 4, 4] from a KITTI poses.txt."""
    with open(path) as f:
        return np.stack([kitti_to_mat(l) for l in f if l.strip()])


def write_kitti_poses(path: str, mats: np.ndarray) -> None:
    with open(path, "w") as f:
        for m in mats:
            f.write(mat_to_kitti(m) + "\n")


def tum_to_mats(times, positions, quats) -> np.ndarray:
    """TUM arrays (t, xyz, xyzw quats) -> [N, 4, 4]."""
    from scipy.spatial.transform import Rotation

    n = len(times)
    out = np.tile(np.eye(4), (n, 1, 1))
    out[:, :3, :3] = Rotation.from_quat(np.asarray(quats)).as_matrix()
    out[:, :3, 3] = positions
    return out


def tum_file_to_kitti(tum_path: str, kitti_path: str) -> None:
    """Convert a written TUM trajectory to KITTI format (the evo_traj step of
    the reference protocol, README.md:69-71)."""
    from ssf_slam_tpu.engine.evaluation import read_tum

    t, p, q = read_tum(tum_path)
    write_kitti_poses(kitti_path, tum_to_mats(t, p, q))


def relative_pose(m_a: np.ndarray, m_b: np.ndarray) -> np.ndarray:
    """T_a^-1 T_b."""
    return np.linalg.inv(m_a) @ m_b
