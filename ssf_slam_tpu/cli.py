"""Command-line interface — the launch-file equivalent.

The reference selects pipelines via roslaunch XML (launch/run_*.launch) with
DATASET_PATH / RESULT_PATH params; here:

    python -m ssf_slam_tpu.cli run --variant onlypc --synthetic --out traj.tum
    python -m ssf_slam_tpu.cli run --variant ssf --dataset /data/SF/04 \
        --ckpt runs/best --out traj.tum
    python -m ssf_slam_tpu.cli train --synthetic --epochs 5 --ckpt-dir runs
    python -m ssf_slam_tpu.cli eval-flow --synthetic --ckpt runs/best

Variant names mirror the launch files (SURVEY §1): onlypc, seg, noseg, sf,
ssf (joint-head, run_Seg_ActiveSceneFlow.launch), ssfc (separate classifier,
run_Pointnet2Seg_ActiveSceneFlow.launch — pass --seg-ckpt).
"""

from __future__ import annotations

import argparse
import dataclasses
import sys

import numpy as np


def _load_frames(args) -> list:
    if args.synthetic:
        from ssf_slam_tpu.data.synthetic import generate_sequence

        return generate_sequence(
            n_frames=args.frames, n_points=args.n_points, seed=args.seed,
            noise=0.004, n_moving=args.n_moving,
            trajectory=args.trajectory,
        )
    if args.dataset.endswith(".ssfb"):
        # native mmap+prefetch loader (native/loader.cc)
        from ssf_slam_tpu.data.ssfb import SsfbSequence

        seq = SsfbSequence(args.dataset)
        return [fr for _, fr in seq.prefetch_iter()]
    from ssf_slam_tpu.data.generic import make_dataset

    # --dataset-kind selects the reader dialect (the reference's
    # --dataset/--dataset_cls switch, main_sju_occ_ros.py:613-666);
    # default is the CARLA npz layout.
    ds = make_dataset(getattr(args, "dataset_kind", "carla") or "carla",
                      args.dataset, n_points=args.n_points)
    return [ds[i] for i in range(len(ds))]


def _build_model(args, variant: str | None = None, joint: bool | None = None):
    """Construct TFlow (+ checkpoint restore) for the sf/ssf variants.

    A joint flow+seg checkpoint (4-channel head) serves the sf variant too:
    the checkpoint is restored as-saved and its shapes compared against the
    3-channel template; on a head mismatch the joint model is built instead
    and the seg channel simply goes unused (the SF path takes flow[..., :3]
    and segments by GMM). Shape-compare-then-build avoids the failed
    template restore of rounds 3-4, whose async orbax errors spammed ~100
    traceback lines per variant even though the fallback succeeded.
    """
    import jax
    import jax.numpy as jnp

    from ssf_slam_tpu.config import FlowNetConfig
    from ssf_slam_tpu.models import TFlow

    if joint is None:
        joint = (variant or args.variant) == "ssf"
    restored = None
    if args.ckpt:
        import os

        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(os.path.abspath(args.ckpt))

    def build(jt: bool):
        cfg = FlowNetConfig(npoint=args.n_points, joint_seg=jt,
                            dtype=args.net_dtype,
                            neighbor_backend=args.neighbor_backend)
        model = TFlow(cfg=cfg)
        pc = jnp.zeros((1, args.n_points, 3))
        return model, jax.jit(model.init)(jax.random.PRNGKey(0), pc, pc)

    def mismatches(variables):
        tmpl = dict(params=variables["params"],
                    batch_stats=variables.get("batch_stats", {}))
        bad = []
        try:
            jax.tree.map(
                lambda a, b: bad.append((a.shape, b.shape))
                if a.shape != b.shape else None, tmpl, restored)
        except ValueError:  # tree structure differs
            return [("<structure>", "<structure>")]
        return bad

    model, variables = build(joint)
    if restored is not None:
        bad = mismatches(variables)
        if bad and not joint:  # flow-only template vs a joint checkpoint
            model, variables = build(True)
            bad = mismatches(variables)
        if bad:
            raise ValueError(
                f"checkpoint {args.ckpt} does not fit the model "
                f"(npoint={args.n_points}): first mismatch "
                f"template{bad[0][0]} vs stored{bad[0][1]} — checkpoints "
                "bind --n-points and the head shape")
        variables = {"params": restored["params"],
                     "batch_stats": restored["batch_stats"]}
    else:
        print("WARNING: no --ckpt given; flow net runs with random weights",
              file=sys.stderr)
    return model, variables


def _predict_flow(frames: list, args, variant: str | None = None) -> None:
    """Run TFlow over each frame pair, writing flow (+seg mask) into frames.

    With ``--resample N`` each pair is predicted N times under random point
    permutations and averaged (the reference's test-time resampling loop,
    main_sju_occ_ros.py:196-216).
    """
    import jax
    import jax.numpy as jnp

    model, variables = _build_model(args, variant)
    joint = (variant or args.variant) == "ssf"

    if args.resample > 1:
        from ssf_slam_tpu.models.inference import predict_flow_resampled

        @jax.jit
        def infer(pc1, pc2):
            return predict_flow_resampled(
                model, variables, pc1, pc2, jax.random.PRNGKey(args.seed),
                n_resample=args.resample)
    else:

        @jax.jit
        def infer(pc1, pc2):
            flows, _ = model.apply(variables, pc1, pc2)
            return flows[0]

    for f in frames:
        out = infer(jnp.asarray(f["pos1"])[None], jnp.asarray(f["pos2"])[None])
        out = np.asarray(out[0])
        f["pred_flow"] = out[:, :3]
        if joint:
            f["static_mask"] = out[:, 3] < 0.0  # logit<0 => static


def _build_seg_classifier(args):
    """SegNet classifier + checkpoint -> seg_apply callable (P6 wiring:
    main_sju_occ_addSeg_Pointnet2_ros.py MODEL LOADING + :360-378)."""
    import jax
    import jax.numpy as jnp

    from ssf_slam_tpu.models.segnet import SegNet

    model = SegNet(n_classes=2, dtype=jnp.bfloat16,
                   neighbor_backend=args.neighbor_backend)
    xyz0 = jnp.zeros((1, args.n_points, 3))
    variables = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), xyz0, xyz0))()
    if args.seg_ckpt:
        import os

        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(
            os.path.abspath(args.seg_ckpt),
            dict(params=variables["params"],
                 batch_stats=variables.get("batch_stats", {})),
        )
        variables = {"params": restored["params"],
                     "batch_stats": restored["batch_stats"]}
    else:
        print("WARNING: no --seg-ckpt given; classifier runs with random "
              "weights (train one with scripts/train_segnet.py)",
              file=sys.stderr)

    def seg_apply(pc, flow):
        return model.apply(variables, pc, flow)

    return seg_apply


def _run_variant(frames: list, variant_name: str, args, *,
                 force_raw: bool = False):
    """Run one pipeline variant over frames -> (times, pos, quat) arrays.

    sf/ssf/ssfc route through the FUSED engine (engine/fused.py): TFlow (and
    for ssfc the SegNet classifier) runs inside the jitted per-scan step —
    no per-frame host dispatch (the round-1 CLI's per-pair infer() hop cost
    ~25 ms/frame on this runtime).

    ``force_raw`` ignores --geom-refine for this variant: cmd_evaluate uses
    it so the Seg reference trajectory (evo's --ref, reference README:64-72)
    is always the raw GT-mask run — measured on the chip, refine anchored on
    the GT mask still degrades seg (0.0354 -> 0.0999 ATE-vs-GT, round 5)
    because the planar-feature anchor inherits scan sparsity the GT flow
    does not have, and a degraded reference distorts every other column.
    """
    from ssf_slam_tpu.config import PipelineConfig, Variant
    from ssf_slam_tpu.engine import run_sequence

    classifier = variant_name == "ssfc"
    variant = Variant.SSF if classifier else Variant(variant_name)
    cfg = PipelineConfig(variant=variant)
    if getattr(args, "geom_refine", False) and not force_raw:
        cfg = cfg.replace(
            egomotion=dataclasses.replace(cfg.egomotion, geom_refine=True))

    if variant in (Variant.SF, Variant.SSF):
        if args.resample > 1 and not classifier:
            # resampling needs per-pair ensemble prediction; host loop
            frames = [dict(f) for f in frames]
            _predict_flow(frames, args, variant_name)
            state, outs = run_sequence(frames, cfg, flow_key="pred_flow")
        else:
            from ssf_slam_tpu.engine.fused import run_sequence_fused

            # the classifier flavor uses the SAME flow net as ssf (a joint
            # checkpoint's 4th channel goes unused) — only the mask source
            # differs, per the reference launch pair
            model, variables = _build_model(
                args, "ssf" if classifier else variant_name)
            seg_apply = _build_seg_classifier(args) if classifier else None
            state, outs = run_sequence_fused(
                model, variables, frames, cfg,
                use_gmm=variant == Variant.SF, seg_apply=seg_apply)
    else:
        state, outs = run_sequence(frames, cfg)
    n_loops = int(state.map_state.n_loops_total)
    if n_loops:
        print(f"[{variant_name}] loop closures fired: {n_loops}",
              file=sys.stderr)
    cap = int(state.map_state.loop_w.shape[0])
    if n_loops > cap:
        print(f"[{variant_name}] loop buffer saturated: {n_loops} closures "
              f"accepted into {cap} slots (weakest factors evicted; raise "
              "mapping.MAX_LOOPS for very loopy deployments)",
              file=sys.stderr)
    dyn_over = np.asarray(outs.get("n_dyn_over", np.zeros(1, np.int32)))
    if int(dyn_over.max(initial=0)) > 0:
        print(f"[{variant_name}] keyframe seg-gate mover budget exceeded on "
              f"{int((dyn_over > 0).sum())} scans (worst overflow "
              f"{int(dyn_over.max())} points past the 1024-point budget; "
              "gate coverage was reduced on those scans)",
              file=sys.stderr)
    times = np.asarray([f["time"] for f in frames])
    return times, outs["pose_t"], outs["pose_q"], state


def cmd_run(args) -> int:
    from ssf_slam_tpu.engine import ate_rmse, write_tum

    if args.stream:
        return _cmd_run_stream(args)
    frames = _load_frames(args)
    times, pos, quat, state = _run_variant(frames, args.variant, args)
    write_tum(args.out, times, pos, quat)
    print(f"wrote {len(times)} poses to {args.out}")
    if args.map_ply:
        from ssf_slam_tpu.utils.viz import map_to_ply

        n = map_to_ply(state.map_state, args.map_ply)
        print(f"wrote {n} map points to {args.map_ply}")

    if args.synthetic:
        from ssf_slam_tpu.engine import rpe

        true_pos = np.stack([f["pose1"][1] for f in frames])
        true_rot = np.stack([f["pose1"][0] for f in frames])
        r = rpe(pos, quat, true_pos, true_rot)
        print(f"ATE RMSE vs ground truth: {ate_rmse(pos, true_pos):.4f} m")
        print(f"RPE vs ground truth: {r['trans_rmse']:.4f} m, "
              f"{r['rot_rmse_deg']:.4f} deg")
    return 0


def _cmd_run_stream(args) -> int:
    """Online mode: per-arriving-scan fused step, incremental TUM, Hz report
    (the reference's live 10 Hz operation, PointCloudOdometry.py:42)."""
    from ssf_slam_tpu.engine.streaming import StreamingRunner
    from ssf_slam_tpu.config import PipelineConfig, Variant

    if args.variant not in ("sf", "ssf", "ssfc"):
        print("--stream drives the fused network-in-the-loop variants "
              "(sf/ssf/ssfc)", file=sys.stderr)
        return 2

    classifier = args.variant == "ssfc"
    model, variables = _build_model(args, "ssf" if classifier else
                                    args.variant)
    seg_apply = _build_seg_classifier(args) if classifier else None
    cfg = PipelineConfig(variant=Variant.SSF)
    if getattr(args, "geom_refine", False):
        cfg = cfg.replace(
            egomotion=dataclasses.replace(cfg.egomotion, geom_refine=True))

    if args.dataset and args.dataset.endswith(".ssfb"):
        # lazy native prefetch — frames stream straight off the mmap
        from ssf_slam_tpu.data.ssfb import SsfbSequence

        seq = SsfbSequence(args.dataset)
        frames = (fr for _, fr in seq.prefetch_iter())
    else:
        frames = iter(_load_frames(args))

    runner = StreamingRunner(
        model, variables, cfg, use_gmm=args.variant == "sf",
        seg_apply=seg_apply, tum_path=args.out,
        pipeline_depth=args.pipeline_depth)
    stats = runner.run(frames)
    print(f"streamed {stats['n_scans']} scans -> {args.out}")
    if getattr(args, "map_ply", None):
        from ssf_slam_tpu.utils.viz import map_to_ply

        n = map_to_ply(runner.final_state.map_state, args.map_ply)
        print(f"wrote {n} map points to {args.map_ply}")
    print(f"rate {stats['hz']:.1f} Hz  completion latency mean "
          f"{stats['latency_ms_mean']:.1f} ms  p95 "
          f"{stats['latency_ms_p95']:.1f} ms  dispatch mean "
          f"{stats['dispatch_ms_mean']:.1f} ms  depth "
          f"{stats['pipeline_depth']}  loops {stats['n_loops']}")
    target = 10.0
    print(f"10 Hz live target: {'MET' if stats['hz'] >= target else 'MISSED'}")
    return 0


def cmd_evaluate(args) -> int:
    """The reference's evo protocol (README.md:64-72): run the pipeline
    variants on ONE sequence, write TUM + KITTI trajectories, and score
    every variant against the GT-seg run (00_Seg is evo's --ref)."""
    import os

    from ssf_slam_tpu.engine import ate_rmse, rpe, write_tum
    from ssf_slam_tpu.utils.poses import tum_file_to_kitti

    variants = args.variants.split(",")
    if "seg" not in variants:
        variants = ["seg"] + variants  # the reference trajectory
    frames = _load_frames(args)
    os.makedirs(args.out_dir, exist_ok=True)

    results = {}
    for v in variants:
        # seg is evo's --ref: always the raw GT-mask run, even under
        # --geom-refine (see _run_variant docstring)
        times, pos, quat, _ = _run_variant(frames, v, args,
                                           force_raw=(v == "seg"))
        tum = os.path.join(args.out_dir, f"00_{v.upper()}.tum")
        write_tum(tum, times, pos, quat)
        tum_file_to_kitti(tum, tum.replace(".tum", ".kitti"))
        results[v] = (pos, quat)
        print(f"[{v}] wrote {tum}", file=sys.stderr)

    ref_pos, ref_quat = results["seg"]
    have_gt = args.synthetic and "pose1" in frames[0]
    if have_gt:
        gt_pos = np.stack([f["pose1"][1] for f in frames])
        gt_rot = np.stack([f["pose1"][0] for f in frames])

    hdr = "| variant | ATE vs Seg (m) | RPE trans (m) | RPE rot (deg) |"
    if have_gt:
        hdr += " ATE vs GT (m) |"
    print(hdr)
    print("|" + "---|" * (hdr.count("|") - 1))
    for v in variants:
        pos, quat = results[v]
        if v == "seg":
            row = f"| {v} | (reference) | | |"
            if have_gt:
                row += f" {ate_rmse(pos, gt_pos):.4f} |"
        else:
            r = rpe(pos, quat, ref_pos, ref_quat)
            row = (f"| {v} | {ate_rmse(pos, ref_pos):.4f} "
                   f"| {r['trans_rmse']:.4f} | {r['rot_rmse_deg']:.4f} |")
            if have_gt:
                row += f" {ate_rmse(pos, gt_pos):.4f} |"
        print(row)
    return 0


def cmd_train(args) -> int:
    from ssf_slam_tpu.config import FlowNetConfig, TrainConfig
    from ssf_slam_tpu.models import TFlow
    from ssf_slam_tpu.train import train_scene_flow

    frames = _load_frames(args)
    split = max(1, int(0.8 * len(frames)))
    train_frames, eval_frames = frames[:split], frames[split:]

    def to_batches(frs):
        def gen():
            rng = np.random.default_rng(0)
            order = rng.permutation(len(frs))
            for s in range(0, len(order) - args.batch_size + 1,
                           args.batch_size):
                items = [frs[int(i)] for i in order[s:s + args.batch_size]]
                yield {
                    k: np.stack([it[k] for it in items])
                    for k in ("pos1", "pos2", "gt", "s_fg_mask", "mask1")
                }
        return gen

    model = TFlow(cfg=FlowNetConfig(npoint=args.n_points,
                                    joint_seg=args.variant == "ssf"))
    tcfg = TrainConfig(batch_size=args.batch_size, epochs=args.epochs)
    state, history = train_scene_flow(
        model, to_batches(train_frames), to_batches(eval_frames),
        cfg=tcfg, n_points=args.n_points, epochs=args.epochs,
        ckpt_dir=args.ckpt_dir,
    )
    print("final eval EPE:", history["eval_epe"][-1])
    return 0


def cmd_eval_flow(args) -> int:
    from ssf_slam_tpu.models.metrics import flow_metrics
    import jax.numpy as jnp

    frames = _load_frames(args)
    _predict_flow(frames, args)
    ms = []
    for f in frames:
        m = flow_metrics(
            jnp.asarray(f["pred_flow"])[None], jnp.asarray(f["gt"])[None],
            jnp.asarray(f["mask1"].astype(np.float32))[None],
        )
        ms.append({k: float(v) for k, v in m.items()})
    agg = {k: float(np.mean([m[k] for m in ms])) for k in ms[0]}
    print("EPE3D {epe3d:.4f}  Acc3DS {acc3d_strict:.4f}  "
          "Acc3DR {acc3d_relax:.4f}  Outlier {outlier:.4f}".format(**agg))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="ssf_slam_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    def common(sp):
        sp.add_argument("--dataset", default=None)
        sp.add_argument("--dataset-kind", default="carla",
                        choices=["carla", "ft3d_hpl", "kitti_hpl",
                                 "ft3d_fn3d", "kitti_fn3d"],
                        help="reader dialect for --dataset (the reference's "
                             "--dataset/--dataset_cls switch)")
        sp.add_argument("--synthetic", action="store_true")
        sp.add_argument("--frames", type=int, default=40)
        sp.add_argument("--n-points", type=int, default=8192)
        sp.add_argument("--n-moving", type=int, default=4)
        sp.add_argument("--seed", type=int, default=0)
        sp.add_argument("--trajectory", default="street",
                        choices=["street", "loop"],
                        help="synthetic ego path; 'loop' revisits (exercises "
                             "loop closure)")
        sp.add_argument("--ckpt", default=None)
        sp.add_argument("--seg-ckpt", default=None,
                        help="SegNet classifier checkpoint for the ssfc "
                             "variant (run_Pointnet2Seg launch parity)")
        sp.add_argument("--resample", type=int, default=1,
                        help="test-time permutation-ensemble size "
                             "(main_sju_occ_ros.py:196-216)")
        sp.add_argument("--net-dtype", default="bfloat16",
                        choices=["float32", "bfloat16"])
        sp.add_argument("--neighbor-backend", default="banded",
                        choices=["banded", "xla"])
        sp.add_argument(
            "--variant", default="seg",
            choices=["onlypc", "seg", "noseg", "sf", "ssf", "ssfc"],
        )
        sp.add_argument(
            "--geom-refine", action="store_true",
            help="seg-gated point-to-plane refinement of the flow pose on "
                 "the learned-flow variants (odometry/flow_refine.py)")

    sp = sub.add_parser("run", help="run a SLAM pipeline, write TUM trajectory")
    common(sp)
    sp.add_argument("--out", default="trajectory.tum")
    sp.add_argument("--map-ply", default=None,
                    help="export the aggregated keyframe map + trajectory "
                         "as a colored PLY (vis_map.py counterpart)")
    sp.add_argument("--stream", action="store_true",
                    help="online mode: per-arriving-scan step + incremental "
                         "TUM + Hz/latency report (live 10 Hz parity)")
    sp.add_argument("--pipeline-depth", type=int, default=2,
                    help="in-flight steps in --stream mode (default 2: "
                         "device computes scan k+1 while the host reads "
                         "back scan k — best throughput; 1 = strictly "
                         "synchronous live-latency semantics, completion "
                         "latency excludes any queue wait)")
    sp.set_defaults(fn=cmd_run)

    sp = sub.add_parser("train", help="train the scene-flow net")
    common(sp)
    sp.add_argument("--epochs", type=int, default=10)
    sp.add_argument("--batch-size", type=int, default=4)
    sp.add_argument("--ckpt-dir", default=None)
    sp.set_defaults(fn=cmd_train)

    sp = sub.add_parser("eval-flow", help="scene-flow EPE metrics")
    common(sp)
    sp.set_defaults(fn=cmd_eval_flow)

    sp = sub.add_parser(
        "evaluate",
        help="evo protocol: run variants on one sequence, write TUM+KITTI "
             "trajectories, score against the Seg reference run",
    )
    common(sp)
    sp.add_argument("--variants", default="onlypc,noseg,sf,ssf",
                    help="comma-separated; seg is always added as reference")
    sp.add_argument("--out-dir", default="results")
    sp.set_defaults(fn=cmd_evaluate)

    args = p.parse_args(argv)
    if not args.synthetic and args.dataset is None:
        p.error("need --dataset or --synthetic")
    return args.fn(args)


if __name__ == "__main__":
    raise SystemExit(main())
