"""Build a KITTI/FlowNet3D-dialect scene-flow sequence from the reference's
REAL CARLA Town02 road map.

`/root/reference/scripts/ActiveSceneFlow/data/town02-map.bin` is a recorded
CARLA Town02 drivable-area point cloud (KITTI x,y,z,intensity float32 rows;
consumed by Generate_Sceneflow.py:949) — geometry this repository did NOT
generate. This script drives a virtual sensor through it and writes one npz
per frame pair in the FOREIGN FlowNet3D key dialect
(``points1/points2/flow/valid_mask1``, utils/datasets/*_flownet3d.py), plus
a ``poses.tum`` ground-truth file, so the pipeline can be exercised
end-to-end on data whose geometry, file format, and directory layout all
come from outside ``data/synthetic.py``:

    python scripts/make_town02_seq.py --out /tmp/town02_seq --frames 30
    python -m ssf_slam_tpu.cli run --variant seg --dataset /tmp/town02_seq \
        --dataset-kind kitti_fn3d --n-points 4096 --out /tmp/town02.tum

The map is planar (all z = -2.5): yaw-only motion keeps every DoF the flow
observes exact. Scan construction is a range gate around the sensor pose
(real LiDARs see ~60 m) + rigid world->sensor transform; flow is the rigid
ego warp (Generate_Sceneflow.py:432 semantics via data/sceneflow_gen.py,
cross-checked against the independent oracle in
tests/test_datasets.py::test_town02_npz_flow_matches_oracle).
"""

from __future__ import annotations

import argparse
import os

import numpy as np

MAP_BIN = "/root/reference/scripts/ActiveSceneFlow/data/town02-map.bin"


def _yaw(a: float) -> np.ndarray:
    c, s = np.cos(a), np.sin(a)
    return np.array([[c, -s, 0.0], [s, c, 0.0], [0.0, 0.0, 1.0]])


def sensor_track(n: int) -> list[tuple[np.ndarray, float]]:
    """A drive through Town02's populated block: straight + gentle turn.

    Stays inside the map's x in [-9, 195], y in [-308, -103] extent.
    """
    poses = []
    pos = np.array([60.0, -250.0, 0.0])
    yaw = 0.15
    for k in range(n + 1):
        poses.append((pos.copy(), yaw))
        yaw += 0.012 * np.sin(k * 0.2)
        pos = pos + _yaw(yaw)[:, 0] * 1.1
    return poses


def make_frames(n_frames: int, radius: float = 60.0,
                min_pts: int = 512) -> tuple[list[dict], list]:
    m = np.fromfile(MAP_BIN, np.float32).reshape(-1, 4)[:, :3]
    poses = sensor_track(n_frames)
    frames = []
    for k in range(n_frames):
        (p1, y1), (p2, y2) = poses[k], poses[k + 1]
        r1, r2 = _yaw(y1), _yaw(y2)

        def view(pw, p, r):
            d = np.linalg.norm(pw[:, :2] - p[None, :2], axis=1)
            sel = pw[d < radius]
            return ((sel - p) @ r).astype(np.float32)  # world -> sensor

        pts1 = view(m, p1, r1)
        pts2 = view(m, p2, r2)
        assert len(pts1) > min_pts and len(pts2) > min_pts, (
            f"frame {k}: track left the mapped area ({len(pts1)} pts)")
        from ssf_slam_tpu.data.sceneflow_gen import ego_flow

        # ego_flow's (r, t) convention: p_world = p_sensor @ r.T + t
        flow = ego_flow(pts1, r1.T, p1, r2.T, p2)
        frames.append(dict(points1=pts1, points2=pts2,
                           flow=flow.astype(np.float32),
                           valid_mask1=np.ones(len(pts1), bool)))
    return frames, poses


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=30)
    args = ap.parse_args()

    frames, poses = make_frames(args.frames)
    os.makedirs(args.out, exist_ok=True)
    for k, fr in enumerate(frames):
        np.savez(os.path.join(args.out, f"{k:06d}.npz"), **fr)
    with open(os.path.join(args.out, "poses.tum"), "w") as fh:
        for k in range(args.frames):
            p, y = poses[k]
            qw, qz = np.cos(y / 2), np.sin(y / 2)
            fh.write(f"{k * 0.1:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                     f"0.000000 0.000000 {qz:.6f} {qw:.6f}\n")
    print(f"wrote {len(frames)} Town02 frame pairs to {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
