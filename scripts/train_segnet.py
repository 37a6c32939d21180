"""Train the standalone PointNet2-style static/moving classifier (P6).

The reference's flagship SSF flavor loads a SEPARATELY-trained sem-seg
classifier fed [xyz || flow] and argmaxes it into the static mask gating the
ego-motion SVD (main_sju_occ_addSeg_Pointnet2_ros.py "MODEL LOADING" block +
:360-378, launch/run_Pointnet2Seg_ActiveSceneFlow.launch:15-17). This is the
TPU equivalent: SegNet (models/segnet.py) trained on synthetic CARLA-style
worlds, GT flow + Gaussian flow-noise augmentation so the classifier stays
robust to the ~0.03 m EPE of the deployed predicted flow.

Labels: 0 = static, 1 = moving (s_fg_mask convention). Weighted CE with
inverse-frequency class weights (my_carla.py:379-393 labelweights).

Usage:
    python scripts/train_segnet.py --epochs 60 --out runs/segnet_r3
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ssf_slam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N_POINTS = 8192


def build_corpus(n_worlds: int, frames_per_world: int):
    """Same world recipe as the round-3 flow corpus (scripts/train_ssf.py)
    including slow/crossing movers; eval world = held-out seed 100."""
    from ssf_slam_tpu.data.synthetic import generate_sequence

    train = []
    for w in range(n_worlds):
        rng = np.random.default_rng(1000 + w)
        slow = w % 3 == 0
        train.extend(generate_sequence(
            n_frames=frames_per_world, n_points=N_POINTS, seed=w,
            noise=float(rng.uniform(0.002, 0.006)),
            n_moving=int(rng.integers(4, 11)),
            radius=float(rng.uniform(18.0, 42.0)),
            mover_speed=(0.5, 3.0) if slow else (3.0, 10.0),
            crossing_frac=0.3,
            fg_oversample=1024,
        ))
    eval_frames = generate_sequence(
        n_frames=16, n_points=N_POINTS, seed=100, noise=0.004, n_moving=5,
        radius=30.0)
    return train, eval_frames


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--n-worlds", type=int, default=8)
    p.add_argument("--frames-per-world", type=int, default=30)
    p.add_argument("--out", default="runs/segnet_r3")
    p.add_argument("--lr", type=float, default=1e-3)
    p.add_argument("--flow-noise", type=float, default=0.05,
                   help="max sigma of the flow-noise augmentation")
    p.add_argument("--max-seconds", type=float, default=None)
    args = p.parse_args()

    from ssf_slam_tpu.data.carla import compute_label_weights
    from ssf_slam_tpu.models.segnet import SegNet
    from ssf_slam_tpu.utils.logging import RunLogger

    t_start = time.time()
    print("generating corpus...", flush=True)
    train_frames, eval_frames = build_corpus(args.n_worlds,
                                             args.frames_per_world)
    lw = compute_label_weights(train_frames, max_items=96)
    print(f"corpus: {len(train_frames)} train / {len(eval_frames)} eval; "
          f"label weights {lw} ({time.time() - t_start:.0f}s)", flush=True)

    model = SegNet(n_classes=2, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    xyz0 = jnp.zeros((1, N_POINTS, 3))
    variables = jax.jit(lambda: model.init(rng, xyz0, xyz0, train=True))()
    tx = optax.adam(args.lr)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    class_w = jnp.asarray(lw, jnp.float32)

    @jax.jit
    def train_step(params, batch_stats, opt_state, batch, key):
        sigma = jax.random.uniform(key, (), minval=0.0,
                                   maxval=args.flow_noise)
        noise = sigma * jax.random.normal(
            jax.random.fold_in(key, 1), batch["flow"].shape)
        flow_in = batch["flow"] + noise

        def loss_fn(params):
            logits, updates = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["xyz"], flow_in, train=True, mutable=["batch_stats"])
            logits = logits.astype(jnp.float32)
            labels = batch["labels"]
            ll = jax.nn.log_softmax(logits, axis=-1)
            ce = -jnp.take_along_axis(ll, labels[..., None], -1)[..., 0]
            w = class_w[labels] * batch["mask"]
            return jnp.sum(ce * w) / jnp.maximum(jnp.sum(w), 1.0), updates

        (loss, updates), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params)
        upd, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, upd)
        return params, updates["batch_stats"], opt_state, loss

    @jax.jit
    def eval_step(params, batch_stats, batch, sigma):
        noise = sigma * jax.random.normal(jax.random.PRNGKey(0),
                                          batch["flow"].shape)
        logits = model.apply({"params": params, "batch_stats": batch_stats},
                             batch["xyz"], batch["flow"] + noise, train=False)
        pred = jnp.argmax(logits.astype(jnp.float32), axis=-1)
        m = batch["mask"]
        y = batch["labels"]

        def iou(p, t):
            inter = jnp.sum((p & t) & (m > 0))
            union = jnp.sum((p | t) & (m > 0))
            return inter / jnp.maximum(union, 1)

        return dict(
            iou_moving=iou(pred == 1, y == 1),
            iou_static=iou(pred == 0, y == 0),
            acc=jnp.sum((pred == y) * m) / jnp.maximum(jnp.sum(m), 1.0),
        )

    def batcher(frames, bs, seed):
        rng = np.random.default_rng(seed)
        order = rng.permutation(len(frames))
        for s in range(0, len(order) - bs + 1, bs):
            items = [frames[int(i)] for i in order[s:s + bs]]
            yield dict(
                xyz=jnp.asarray(np.stack([it["pos1"] for it in items])),
                flow=jnp.asarray(np.stack([it["gt"] for it in items])),
                labels=jnp.asarray(np.stack(
                    [(it["s_fg_mask"] > 0.5) for it in items]), jnp.int32),
                mask=jnp.asarray(np.stack(
                    [it["mask1"] for it in items]), jnp.float32),
            )

    os.makedirs(args.out, exist_ok=True)
    logger = RunLogger(args.out)
    logger.snapshot_config(dict(argv=" ".join(sys.argv), lw=lw.tolist(),
                                n_points=N_POINTS))
    best_miou = -1.0
    key = jax.random.PRNGKey(7)
    for epoch in range(args.epochs):
        t0 = time.time()
        losses = []
        for batch in batcher(train_frames, args.batch_size, epoch):
            key, sub = jax.random.split(key)
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, batch, sub)
            losses.append(float(loss))
        # eval at deployment-realistic flow noise (~predicted-flow EPE) and
        # clean
        ms = []
        for batch in batcher(eval_frames, args.batch_size, 999):
            ms.append({k: float(v) for k, v in eval_step(
                params, batch_stats, batch, jnp.float32(0.035)).items()})
        agg = {k: float(np.mean([m[k] for m in ms])) for k in ms[0]}
        miou = 0.5 * (agg["iou_moving"] + agg["iou_static"])
        dt = time.time() - t0
        logger.cprint(
            f"epoch {epoch}: loss {np.mean(losses):.4f} "
            f"iou_mov {agg['iou_moving']:.4f} iou_stat "
            f"{agg['iou_static']:.4f} acc {agg['acc']:.4f} ({dt:.0f}s)")
        logger.metrics(epoch, epoch_loss=float(np.mean(losses)), **agg)
        if miou > best_miou:
            best_miou = miou
            import orbax.checkpoint as ocp

            ckptr = ocp.StandardCheckpointer()
            ckptr.save(os.path.abspath(os.path.join(args.out, "best")),
                       dict(params=jax.tree.map(np.asarray, params),
                            batch_stats=jax.tree.map(np.asarray,
                                                     batch_stats)),
                       force=True)
            ckptr.wait_until_finished()
        if args.max_seconds and time.time() - t_start > args.max_seconds:
            logger.cprint(f"max-seconds reached at epoch {epoch}")
            break
    logger.cprint(f"best mIoU {best_miou:.4f}")
    logger.close()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
