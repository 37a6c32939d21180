"""Trainer-loop tests: best-state materialization, RunLogger wiring, resume."""

import json
import os

import numpy as np
import pytest

from ssf_slam_tpu.config import FlowNetConfig, TrainConfig
from ssf_slam_tpu.models import TFlow

TINY = FlowNetConfig(
    npoint=256,
    sa_npoints=(128, 64, 32, 16),
    sa_nsample=(8, 8, 8, 8),
    cost_nsample=8,
)


def _batches(n_points=256, n_batches=2, seed=0):
    rng = np.random.default_rng(seed)

    def gen():
        for _ in range(n_batches):
            pos1 = rng.normal(size=(2, n_points, 3)).astype(np.float32)
            flow = np.full((2, n_points, 3), 0.05, np.float32)
            yield dict(
                pos1=pos1, pos2=pos1 + flow, gt=flow,
                mask1=np.ones((2, n_points), np.float32),
            )

    return gen


def test_train_best_state_survives_donation_and_resume(tmp_path):
    """Regression: best_state used to alias donated buffers — any access
    after a later step raised 'Array has been deleted' whenever the best
    epoch was not the last. The same run then seeds a resume (init_state)
    leg — one test, one model, two train_scene_flow invocations total
    (each invocation retraces the jitted step; a third is pure suite tax).
    """
    from ssf_slam_tpu.train.trainer import train_scene_flow

    model = TFlow(cfg=TINY)
    run_dir = str(tmp_path / "run")
    best, history = train_scene_flow(
        model, _batches(), _batches(seed=1),
        cfg=TrainConfig(batch_size=2, epochs=2),
        n_points=256, epochs=2, verbose=False, run_dir=run_dir,
    )
    # touching every leaf of the returned best state must not raise
    leaves = [np.asarray(x) for x in __import__("jax").tree.leaves(best)]
    assert all(np.isfinite(x).all() for x in leaves if x.dtype.kind == "f")
    assert len(history["train_loss"]) == 2

    # RunLogger wiring: run.log + metrics.jsonl + config snapshot exist
    assert os.path.exists(os.path.join(run_dir, "run.log"))
    recs = [json.loads(l) for l in open(os.path.join(run_dir, "metrics.jsonl"))]
    assert any("eval_epe" in r for r in recs)
    cfg_json = json.load(open(os.path.join(run_dir, "config.json")))
    assert cfg_json["train"]["batch_size"] == 2

    # resume leg: continue from the returned best state
    step0 = int(best.step)
    best2, _ = train_scene_flow(
        model, _batches(), _batches(seed=1),
        cfg=TrainConfig(batch_size=2, epochs=1), n_points=256,
        epochs=1, verbose=False, init_state=best,
    )
    assert int(best2.step) > step0


# ---------------------------------------------------------------------------
# Harness bookkeeping (ssf_slam_tpu/train/harness.py) — the machinery that
# produced every committed checkpoint (scripts/train_ssf.py), extracted and
# unit-tested per the round-4 verdict.
# ---------------------------------------------------------------------------


def test_parse_best_criterion():
    from ssf_slam_tpu.train.harness import parse_best_criterion

    assert parse_best_criterion("epe") == 0.0
    assert parse_best_criterion("gated:0.85") == 0.85
    with pytest.raises(ValueError):
        parse_best_criterion("best-vibes")


def test_best_tracker_gated_selection():
    """gated:<iou> picks the min-EPE epoch AMONG qualifying epochs, even
    when a non-qualifying epoch has lower EPE."""
    from ssf_slam_tpu.train.harness import BestTracker

    t = BestTracker(gate_iou=0.85)
    # epoch 0: great EPE but fails the IoU gate -> not best
    assert not t.update(dict(epe3d=0.01, iou_moving=0.50), epoch=0)
    # epoch 1: qualifies -> best
    assert t.update(dict(epe3d=0.05, iou_moving=0.90), epoch=1)
    # epoch 2: qualifies, worse EPE -> not best
    assert not t.update(dict(epe3d=0.06, iou_moving=0.95), epoch=2)
    # epoch 3: qualifies, better EPE -> new best
    assert t.update(dict(epe3d=0.04, iou_moving=0.86), epoch=3)
    assert t.best_epoch == 3 and t.best_epe == 0.04
    assert not t.never_qualified

    # a gate nothing clears reports never_qualified
    t2 = BestTracker(gate_iou=0.99)
    t2.update(dict(epe3d=0.01, iou_moving=0.5), epoch=0)
    assert t2.never_qualified
    # ungated tracker treats metrics without iou_moving as qualifying
    t3 = BestTracker()
    assert t3.update(dict(epe3d=0.2), epoch=0)


def test_resume_roundtrip(tmp_path):
    """save_resume/load_resume round-trip params, opt state, step, and the
    epoch/best bookkeeping — the chunked-run path every checkpoint used."""
    import jax

    from ssf_slam_tpu.train.harness import load_resume, save_resume
    from ssf_slam_tpu.train.trainer import create_train_state

    model = TFlow(cfg=TINY)
    state, _ = create_train_state(model, jax.random.PRNGKey(0), 256,
                                  TrainConfig(batch_size=2))
    state = state._replace(step=state.step + 17)
    out = str(tmp_path / "run")
    os.makedirs(out)
    save_resume(out, state, epoch=4, best_epe=0.123)

    fresh, _ = create_train_state(model, jax.random.PRNGKey(1), 256,
                                  TrainConfig(batch_size=2))
    restored, start_epoch, best_epe = load_resume(out, fresh)
    assert start_epoch == 5 and best_epe == 0.123
    assert int(restored.step) == 17
    a = jax.tree.leaves(state.params)[0]
    b = jax.tree.leaves(restored.params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # fresh directory: untouched state, epoch 0
    _, e0, b0 = load_resume(str(tmp_path / "nope"), fresh)
    assert e0 == 0 and b0 == float("inf")


def test_batcher_covers_and_reseeds():
    from ssf_slam_tpu.train.harness import batcher

    frames = [dict(pos1=np.full((4, 3), i, np.float32)) for i in range(10)]
    holder = [7]
    gen = batcher(frames, batch_size=3, seed_holder=holder, keys=("pos1",))
    seen = []
    n_b = 0
    for b in gen():
        assert b["pos1"].shape == (3, 4, 3)
        seen.extend(b["pos1"][:, 0, 0].tolist())
        n_b += 1
    assert n_b == 3 and len(set(seen)) == 9  # drop-last, no repeats
    assert holder[0] == 8  # seed advanced
    order2 = [b["pos1"][:, 0, 0].tolist() for b in gen()]
    assert [x for xs in order2 for x in xs] != seen  # reshuffled epoch


def test_seg_class_weights_reach_the_loss():
    """LossConfig.seg_class_weights must change the training loss — the
    inverse-frequency labelweights path (my_carla.py:379-393 parity)."""
    import jax
    import jax.numpy as jnp

    from ssf_slam_tpu.config import LossConfig
    from ssf_slam_tpu.train.trainer import (
        create_train_state,
        make_train_step,
    )

    cfg_joint = FlowNetConfig(
        npoint=256, sa_npoints=(128, 64, 32, 16), sa_nsample=(8, 8, 8, 8),
        cost_nsample=8, joint_seg=True)
    model = TFlow(cfg=cfg_joint)
    tcfg = TrainConfig(batch_size=2)

    rng = np.random.default_rng(0)
    pos1 = rng.normal(size=(2, 256, 3)).astype(np.float32)
    flow = np.full((2, 256, 3), 0.05, np.float32)
    fg = (rng.random((2, 256)) < 0.2).astype(np.float32)
    batch = dict(pos1=jnp.asarray(pos1), pos2=jnp.asarray(pos1 + flow),
                 gt=jnp.asarray(flow), mask1=jnp.ones((2, 256)),
                 s_fg_mask=jnp.asarray(fg))

    losses = {}
    for name, w in (("flat", (1.0, 1.0)), ("skewed", (0.2, 5.0))):
        # fresh state per run: the train step DONATES its state argument
        state, tx = create_train_state(model, jax.random.PRNGKey(0), 256,
                                       tcfg)
        step = make_train_step(model, tx, tcfg, LossConfig(
            seg_class_weights=w))
        _, metrics = step(state, batch)
        losses[name] = float(metrics["loss"])
    assert np.isfinite(list(losses.values())).all()
    assert abs(losses["flat"] - losses["skewed"]) > 1e-5, losses
