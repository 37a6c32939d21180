"""Scene-flow training loop.

Replaces the reference harness (main_sju_occ_ros.py:324-452 / main_sju_occ.py):
Adam with weight decay 1e-4, staircase exponential LR decay with a 1e-5
floor (exp_lr_scheduler, :396-408), multi-scale loss, per-epoch eval with
EPE/acc/outlier, checkpoint-on-best-EPE via orbax (model.best.t7 semantics,
:439-452).

Data parallelism: the reference wraps the net in nn.DataParallel
(:681-685); here the train step is donated+jitted with batch sharding over a
mesh (see parallel/mesh.py) — on a single chip it runs unsharded.
"""

from __future__ import annotations

import functools
from typing import Any, Iterator, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ssf_slam_tpu.config import LossConfig, TrainConfig
from ssf_slam_tpu.models.metrics import flow_metrics, seg_metrics
from ssf_slam_tpu.models.tflow import TFlow, multi_scale_loss

Array = jax.Array


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: Array


def exp_decay_lr(
    step: Array, cfg: TrainConfig, batch_size: int
) -> Array:
    """Staircase exponential decay (main_sju_occ_ros.py:396-408).

    The reference counts "global_step" in SAMPLES (epoch * len(loader) *
    batch_size); we keep that convention for parity.
    """
    samples = step * batch_size
    lr = cfg.lr * cfg.decay_rate ** (samples // cfg.decay_steps)
    return jnp.maximum(lr, cfg.lr_min)


def create_train_state(
    model: TFlow,
    rng: Array,
    n_points: int,
    cfg: TrainConfig = TrainConfig(),
) -> tuple[TrainState, optax.GradientTransformation]:
    pc = jnp.zeros((1, n_points, 3))
    variables = jax.jit(functools.partial(model.init, train=True))(rng, pc, pc)
    # L2-in-gradient + Adam matches torch.optim.Adam(weight_decay=1e-4)
    # (main_sju_occ_ros.py:418); the schedule is the staircase decay.
    schedule = lambda count: exp_decay_lr(count, cfg, cfg.batch_size)  # noqa: E731
    tx = optax.chain(
        optax.clip_by_global_norm(5.0),  # the summed multi-scale loss scales
        optax.add_decayed_weights(cfg.weight_decay),  # with N; clip for safety
        optax.scale_by_adam(),
        optax.scale_by_learning_rate(schedule),
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return (
        TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=tx.init(params),
            step=jnp.int32(0),
        ),
        tx,
    )


def make_train_step(
    model: TFlow,
    tx: optax.GradientTransformation,
    cfg: TrainConfig = TrainConfig(),
    loss_cfg: LossConfig = LossConfig(),
    freeze_bn: bool = False,
):
    """Build the jitted train step (donated carry).

    ``freeze_bn`` runs BatchNorm in inference mode during training (frozen
    running stats, no updates) — the standard fine-tuning guard against
    domain-shifted batch statistics. Measured motivation (round 5): mixing
    12-37% Town02 pairs into the corpus dropped SYNTHETIC eval moving-IoU
    0.905 -> ~0.70 at epoch 0 regardless of lr (1e-4 or 3e-5) — a
    batch-stats shift, not weight forgetting, since BN momentum updates
    don't scale with the learning rate.
    """

    def step_fn(state: TrainState, batch: dict) -> tuple[TrainState, dict]:
        def loss_fn(params):
            if freeze_bn:
                flows, fps = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["pos1"], batch["pos2"], train=False,
                )
                updates = {"batch_stats": state.batch_stats}
            else:
                (flows, fps), updates = model.apply(
                    {"params": params, "batch_stats": state.batch_stats},
                    batch["pos1"], batch["pos2"], train=True,
                    mutable=["batch_stats"],
                )
            seg = batch.get("s_fg_mask") if model.cfg.joint_seg else None
            loss = multi_scale_loss(
                flows, batch["gt"], batch["mask1"].astype(jnp.float32), fps,
                alpha=loss_cfg.alpha, seg_labels=seg,
                seg_weight=loss_cfg.seg_weight,
                seg_class_weights=loss_cfg.seg_class_weights,
            )
            return loss, (updates["batch_stats"], flows)

        (loss, (bs, flows)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = dict(
            loss=loss, lr=exp_decay_lr(state.step, cfg, cfg.batch_size)
        )
        return (
            TrainState(params, bs, opt_state, state.step + 1),
            metrics,
        )

    return jax.jit(step_fn, donate_argnums=(0,))


def make_eval_step(model: TFlow):
    def eval_fn(state: TrainState, batch: dict) -> dict:
        flows, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["pos1"], batch["pos2"], train=False,
        )
        mask = batch["mask1"].astype(jnp.float32)
        out = flow_metrics(flows[0][..., :3], batch["gt"], mask)
        if model.cfg.joint_seg and flows[0].shape[-1] == 4:
            out.update(seg_metrics(
                flows[0][..., 3], batch["s_fg_mask"], mask))
        return out

    return jax.jit(eval_fn)


# convenience singletons for the default model
train_step = None  # built lazily by train_scene_flow
eval_step = None


def train_scene_flow(
    model: TFlow,
    train_batches: Iterator[dict],
    eval_batches_fn,
    cfg: TrainConfig = TrainConfig(),
    loss_cfg: LossConfig = LossConfig(),
    n_points: int = 8192,
    epochs: Optional[int] = None,
    ckpt_dir: Optional[str] = None,
    log_every: int = 100,
    verbose: bool = True,
    run_dir: Optional[str] = None,
    init_state: Optional[TrainState] = None,
) -> tuple[TrainState, dict]:
    """Full training run; returns (best-state, history).

    ``train_batches``: callable () -> iterator of batch dicts per epoch.
    ``eval_batches_fn``: callable () -> iterator for eval.
    Checkpoints best-EPE params to ``ckpt_dir`` via orbax when given
    (model.best.t7 semantics, main_sju_occ_ros.py:439-445).
    ``run_dir``: when given, a RunLogger streams loss/lr every ``log_every``
    steps plus per-epoch eval metrics to run.log / metrics.jsonl and
    snapshots the config — the reference's IOStream + TensorBoard pair
    (main_sju_occ_ros.py:50-60,370-385).
    ``init_state``: resume from an existing TrainState (e.g. a restored
    checkpoint) instead of a fresh init.
    """
    rng = jax.random.PRNGKey(cfg.seed)
    state, tx = create_train_state(model, rng, n_points, cfg)
    if init_state is not None:
        state = init_state
    step_fn = make_train_step(model, tx, cfg, loss_cfg)
    eval_fn = make_eval_step(model)

    logger = None
    if run_dir is not None:
        from ssf_slam_tpu.utils.logging import RunLogger

        logger = RunLogger(run_dir)
        logger.snapshot_config(dict(train=cfg, loss=loss_cfg,
                                    model=model.cfg, n_points=n_points))

    best_epe = float("inf")
    # the train step donates its input state; snapshots must be materialized
    # host-side or later steps delete the "best" buffers out from under us
    snapshot = lambda s: jax.tree.map(np.asarray, s)  # noqa: E731
    best_state = snapshot(state)
    history = {"train_loss": [], "eval_epe": []}
    for epoch in range(epochs or cfg.epochs):
        losses = []
        for batch in train_batches():
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            state, metrics = step_fn(state, batch)
            loss = float(metrics["loss"])
            losses.append(loss)
            if logger is not None and int(state.step) % log_every == 0:
                logger.metrics(int(state.step), train_loss=loss,
                               lr=float(metrics["lr"]))
        epoch_loss = float(np.mean(losses)) if losses else float("nan")

        epes, mious = [], []
        for batch in eval_batches_fn():
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            m = eval_fn(state, batch)
            epes.append(float(m["epe3d"]))
            if "miou" in m:
                mious.append(float(m["miou"]))
        epoch_epe = float(np.mean(epes)) if epes else float("nan")
        history["train_loss"].append(epoch_loss)
        history["eval_epe"].append(epoch_epe)
        msg = f"epoch {epoch}: loss {epoch_loss:.4f} EPE {epoch_epe:.4f}"
        if mious:
            epoch_miou = float(np.mean(mious))
            history.setdefault("eval_miou", []).append(epoch_miou)
            msg += f" mIoU {epoch_miou:.4f}"
        if logger is not None:
            logger.cprint(msg)
            logger.metrics(int(state.step), epoch=epoch,
                           epoch_loss=epoch_loss, eval_epe=epoch_epe)
        elif verbose:
            print(msg, flush=True)

        if epoch_epe < best_epe:
            best_epe = epoch_epe
            best_state = snapshot(state)
            if ckpt_dir is not None:
                save_checkpoint(ckpt_dir, state)
    if logger is not None:
        logger.close()
    return best_state, history


def save_checkpoint(path: str, state: TrainState) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        f"{path}/best", dict(params=state.params, batch_stats=state.batch_stats),
        force=True,
    )
    ckptr.wait_until_finished()


def load_checkpoint(path: str, state: TrainState) -> TrainState:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    target = dict(params=state.params, batch_stats=state.batch_stats)
    restored = ckptr.restore(f"{path}/best", target)
    return state._replace(
        params=restored["params"], batch_stats=restored["batch_stats"]
    )
