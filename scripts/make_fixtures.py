"""One-time generator for the committed golden data-layer fixtures.

Writes tiny examples in the three external dialects the loaders claim to
read (keys per the reference loaders — utils/datasets/carla.py:455-465,
flyingthings3d_flownet3d.py, flyingthings3d_hplflownet.py) WITHOUT going
through any of this repo's writer code, so the loader tests exercise real
foreign files. Deterministic: rerunning reproduces identical bytes.

    python scripts/make_fixtures.py
"""

from __future__ import annotations

import os

import numpy as np

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))), "tests", "fixtures")


def rigid_pair(rng, n=120, yaw=0.02, t=(0.4, -0.1, 0.0)):
    """Analytic scene: rigid yaw+translation, one translating mover."""
    pos1 = rng.uniform([-20, -20, -4], [20, 20, 2], (n, 3))
    c, s = np.cos(yaw), np.sin(yaw)
    r = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1.0]])
    flow = pos1 @ r.T + np.asarray(t) - pos1
    fg = np.zeros(n)
    fg[:10] = 1.0  # first 10 rows are a mover with extra displacement
    flow[:10] += np.array([1.5, 0.0, 0.0])
    pos2 = pos1 + flow
    return (pos1.astype(np.float32), pos2.astype(np.float32),
            flow.astype(np.float32), fg.astype(np.float32))


def main():
    rng = np.random.default_rng(12345)

    # --- CARLA npz dialect (utils/datasets/carla.py:455-465 keys)
    d = os.path.join(ROOT, "carla")
    os.makedirs(d, exist_ok=True)
    for i in range(2):
        pos1, pos2, gt, fg = rigid_pair(rng)
        np.savez(
            os.path.join(d, f"{i:06d}.npz"),
            pos1=pos1.astype(np.float64),  # reference writes float64
            pos2=pos2.astype(np.float64),
            gt=gt.astype(np.float64),
            ego_flow=(gt - np.where(fg[:, None] > 0,
                                    np.array([1.5, 0, 0]), 0.0)
                      ).astype(np.float64),
            s_fg_mask=fg.astype(np.float64),
            t_fg_mask=fg.astype(np.float64),
        )

    # --- FlowNet3D npz dialect (points1/points2/flow/valid_mask1)
    d = os.path.join(ROOT, "flownet3d")
    os.makedirs(d, exist_ok=True)
    pos1, pos2, gt, fg = rigid_pair(rng)
    valid = np.ones(len(pos1), bool)
    valid[100:] = False  # occluded tail
    np.savez(os.path.join(d, "000000.npz"), points1=pos1, points2=pos2,
             flow=gt, valid_mask1=valid)
    pos1b, pos2b, gtb, fgb = rigid_pair(rng)
    np.savez(os.path.join(d, "000001.npz"), pos1=pos1b, pos2=pos2b, gt=gtb,
             s_fg_mask=fgb)

    # --- HPLFlowNet per-example dirs (pc1.npy/pc2.npy, flow = pc2 - pc1)
    d = os.path.join(ROOT, "hplflownet", "000000")
    os.makedirs(d, exist_ok=True)
    pos1, pos2, gt, _ = rigid_pair(rng)
    np.save(os.path.join(d, "pc1.npy"), pos1)
    np.save(os.path.join(d, "pc2.npy"), (pos1 + gt).astype(np.float32))

    print("fixtures written under", ROOT)


if __name__ == "__main__":
    main()
