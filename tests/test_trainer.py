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
