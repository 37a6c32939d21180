"""Trajectory output + evaluation.

- TUM-format trajectory writing, matching the reference's incremental
  RESULT_PATH writer (src/mapOptmization.cpp:353-374): lines of
  ``time tx ty tz qx qy qz qw``.
- ATE RMSE with Umeyama/Kabsch alignment — the evo-equivalent of the
  reference's evaluation protocol (`evo_traj kitti ... --ref=00_Seg.kitti`,
  README.md:64-72) so trajectories can be scored without external tools.
"""

from __future__ import annotations

import numpy as np


def write_tum(path: str, times, positions, quats) -> None:
    """Append-style TUM writer (overwrite semantics per run)."""
    with open(path, "w") as f:
        for t, p, q in zip(times, positions, quats):
            f.write(
                f"{t:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                f"{q[0]:.6f} {q[1]:.6f} {q[2]:.6f} {q[3]:.6f}\n"
            )


def read_tum(path: str):
    data = np.loadtxt(path).reshape(-1, 8)
    return data[:, 0], data[:, 1:4], data[:, 4:8]


def umeyama_align(est: np.ndarray, ref: np.ndarray):
    """SE(3) alignment est -> ref (no scale), as evo's ATE alignment."""
    mu_e, mu_r = est.mean(0), ref.mean(0)
    h = (est - mu_e).T @ (ref - mu_r)
    u, _, vt = np.linalg.svd(h)
    d = np.sign(np.linalg.det(vt.T @ u.T))
    s = np.diag([1.0, 1.0, d])
    r = vt.T @ s @ u.T
    t = mu_r - r @ mu_e
    return r, t


def ate_rmse(est_pos: np.ndarray, ref_pos: np.ndarray, align: bool = True):
    """Absolute trajectory error RMSE over associated positions."""
    est, ref = np.asarray(est_pos, float), np.asarray(ref_pos, float)
    assert est.shape == ref.shape
    if align and len(est) >= 3:
        r, t = umeyama_align(est, ref)
        est = est @ r.T + t
    err = np.linalg.norm(est - ref, axis=1)
    return float(np.sqrt(np.mean(err**2)))


def rpe_rmse(
    est_pos: np.ndarray, ref_pos: np.ndarray, delta: int = 1
) -> float:
    """Relative pose error RMSE (translation part, frame-delta pairs).

    The second half of the evo evaluation protocol (APE + RPE) the reference
    defers to external tooling (README.md:64-72): per-step drift independent
    of global alignment.
    """
    est, ref = np.asarray(est_pos, float), np.asarray(ref_pos, float)
    d_est = np.linalg.norm(est[delta:] - est[:-delta], axis=1)
    d_ref = np.linalg.norm(ref[delta:] - ref[:-delta], axis=1)
    return float(np.sqrt(np.mean((d_est - d_ref) ** 2)))
