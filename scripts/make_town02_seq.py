"""Build a KITTI/FlowNet3D-dialect scene-flow sequence from the reference's
REAL CARLA Town02 road map.

Thin CLI over ``ssf_slam_tpu.data.town02`` (see that module's docstring for
the geometry/flow semantics and provenance). Writes one npz per frame pair
in the FOREIGN FlowNet3D key dialect (``points1/points2/flow/valid_mask1``,
utils/datasets/*_flownet3d.py), plus a ``poses.tum`` ground-truth file, so
the pipeline can be exercised end-to-end on data whose geometry, file
format, and directory layout all come from outside ``data/synthetic.py``:

    python scripts/make_town02_seq.py --out /tmp/town02_seq --frames 30
    python -m ssf_slam_tpu.cli run --variant seg --dataset /tmp/town02_seq \
        --dataset-kind kitti_fn3d --n-points 4096 --out /tmp/town02.tum
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ssf_slam_tpu.data.town02 import (  # noqa: E402,F401  (re-exported for tests)
    MAP_BIN,
    _yaw,
    make_frames,
    sensor_track,
    vehicle_tracks,
)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--frames", type=int, default=30)
    ap.add_argument("--vehicles", type=int, default=0,
                    help="tracked movers on the map (bbox motion + rotation "
                         "delta in the flow, Generate_Sceneflow.py:498-523 "
                         "semantics; writes s_fg_mask)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--route-seed", type=int, default=None,
                    help="vary start pose / heading / curvature (None = "
                         "the canonical round-4 route)")
    ap.add_argument("--structures", action="store_true",
                    help="add procedural road-edge facades (the map alone "
                         "is planar -> in-plane motion unobservable; see "
                         "data/town02.py::map_structures)")
    args = ap.parse_args()

    frames, poses = make_frames(args.frames, n_vehicles=args.vehicles,
                                seed=args.seed, route_seed=args.route_seed,
                                structures=args.structures)
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
