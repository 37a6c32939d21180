"""Learned-path evaluation on REAL Town02 geometry WITH tracked movers.

The round-4 verdict's top data gap: the learned SSF pipeline had never seen
non-self-generated geometry with dynamics. This script builds a Town02
mover sequence (scripts/make_town02_seq.py — real recorded CARLA map +
bbox-tracked vehicles, Generate_Sceneflow.py:498-523 flow semantics), runs
the FULL learned path (TFlow inference fused in the SLAM step, 8192 pts,
joint seg head), and scores:

- trajectory ATE vs the recorded sensor poses;
- flow EPE3D / Acc3DR vs the generated GT flow;
- moving-class IoU of the seg head vs the bbox labels.

Usage:
    python scripts/eval_town02.py --ckpt runs/ssf_r3ft2/best \
        [--frames 30 --vehicles 5 --seed 7 --n-points 8192]
"""

from __future__ import annotations

import argparse
import importlib.util
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ssf_slam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def load_maker():
    spec = importlib.util.spec_from_file_location(
        "make_town02_seq",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "make_town02_seq.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", required=True)
    p.add_argument("--frames", type=int, default=30)
    p.add_argument("--vehicles", type=int, default=5)
    p.add_argument("--seed", type=int, default=7)
    p.add_argument("--n-points", type=int, default=8192)
    p.add_argument("--net-dtype", default="bfloat16")
    p.add_argument("--neighbor-backend", default="banded")
    p.add_argument("--resample", type=int, default=1)
    p.add_argument("--variant", default="ssf")
    p.add_argument("--structures", action="store_true",
                   help="add procedural road-edge facades (observable "
                        "geometry; the bare map is planar — see "
                        "data/town02.py::map_structures)")
    p.add_argument("--out-json", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from ssf_slam_tpu.cli import _build_model
    from ssf_slam_tpu.config import PipelineConfig, Variant
    from ssf_slam_tpu.data.carla import pad_points
    from ssf_slam_tpu.engine import ate_rmse
    from ssf_slam_tpu.engine.fused import run_sequence_fused
    from ssf_slam_tpu.models.metrics import flow_metrics, seg_metrics

    mod = load_maker()
    raw, poses = mod.make_frames(args.frames, n_vehicles=args.vehicles,
                                 seed=args.seed,
                                 structures=args.structures)
    n = args.n_points
    rng = np.random.default_rng(0)
    frames = []
    for k, fr in enumerate(raw):
        p1, m1, i1 = pad_points(fr["points1"], n, rng)
        p2, m2, _ = pad_points(fr["points2"], n, rng)
        frames.append(dict(
            pos1=p1, pos2=p2, gt=fr["flow"][i1].astype(np.float32),
            s_fg_mask=fr["s_fg_mask"][i1].astype(np.float32),
            mask1=m1, mask2=m2, time=k * 0.1,
        ))

    model, variables = _build_model(args, "ssf")
    cfg = PipelineConfig(variant=Variant.SSF)

    # --- trajectory through the fused net-in-the-loop engine
    state, outs = run_sequence_fused(model, variables, frames, cfg)
    est = np.asarray(outs["pose_t"])
    ref = np.stack([poses[k][0] for k in range(len(est))])
    ate = float(ate_rmse(est, ref))

    # --- per-pair flow + seg metrics (net applied pairwise, like eval-flow)
    @jax.jit
    def infer(pc1, pc2):
        flows, _ = model.apply(variables, pc1, pc2)
        return flows[0]

    fm, sm = [], []
    for f in frames:
        out = np.asarray(infer(jnp.asarray(f["pos1"])[None],
                                jnp.asarray(f["pos2"])[None])[0])
        m = flow_metrics(jnp.asarray(out[None, :, :3]),
                         jnp.asarray(f["gt"])[None],
                         jnp.asarray(f["mask1"].astype(np.float32))[None])
        fm.append({k: float(v) for k, v in m.items()})
        if out.shape[1] > 3:
            s = seg_metrics(jnp.asarray(out[None, :, 3]),
                            jnp.asarray(f["s_fg_mask"])[None],
                            jnp.asarray(f["mask1"].astype(np.float32))[None])
            sm.append({k: float(v) for k, v in s.items()})
    agg = {k: float(np.mean([m[k] for m in fm])) for k in fm[0]}
    if sm:
        agg.update({k: float(np.mean([m[k] for m in sm])) for k in sm[0]})
    agg["ate_m"] = ate
    agg["n_frames"] = len(frames)
    agg["n_vehicles"] = args.vehicles
    agg["n_loops"] = int(state.map_state.n_loops_total)
    print(json.dumps({k: round(v, 5) if isinstance(v, float) else v
                      for k, v in agg.items()}))
    if args.out_json:
        with open(args.out_json, "w") as fh:
            json.dump(agg, fh, indent=1)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
