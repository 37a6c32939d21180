"""Training-harness bookkeeping, extracted from scripts/train_ssf.py so the
machinery that produced every committed checkpoint is unit-testable:

- best-checkpoint selection (``parse_best_criterion`` + ``BestTracker``):
  the reference keeps ``model.best.t7`` on min held-out EPE
  (main_sju_occ_ros.py:439-445); the ``gated:<iou>`` criterion additionally
  requires a minimum moving-class IoU, targeting seg recall without trading
  it for flow accuracy (round-3 recipe);
- chunked-run resume (``save_resume`` / ``load_resume``): full optimizer
  state + step + epoch bookkeeping via orbax, so a 600-epoch regimen
  (main_sju_occ.sh:8-14) can run in bounded wall-clock chunks;
- the epoch ``batcher`` (shuffled, drop-last, reseeded per epoch).
"""

from __future__ import annotations

import json
import os
from typing import Callable

import jax.numpy as jnp
import numpy as np


def parse_best_criterion(spec: str) -> float:
    """'epe' -> 0.0 (ungated); 'gated:<iou>' -> the IoU gate.

    Raises ValueError on anything else.
    """
    if spec == "epe":
        return 0.0
    if spec.startswith("gated:"):
        return float(spec.split(":", 1)[1])
    raise ValueError(f"unknown --best-criterion {spec!r}")


class BestTracker:
    """Min-EPE-among-qualifying-epochs selection.

    ``update(metrics)`` returns True when this epoch becomes the new best
    (the caller then writes the 'best' checkpoint — model.best.t7
    semantics). An epoch qualifies when its moving-class IoU clears
    ``gate_iou`` (0 = every epoch qualifies).
    """

    def __init__(self, gate_iou: float = 0.0, best_epe: float = float("inf")):
        self.gate_iou = gate_iou
        self.best_epe = best_epe
        self.best_epoch: int | None = None

    def update(self, metrics: dict, epoch: int | None = None) -> bool:
        qualifies = metrics.get("iou_moving", 0.0) >= self.gate_iou
        if qualifies and metrics["epe3d"] < self.best_epe:
            self.best_epe = float(metrics["epe3d"])
            self.best_epoch = epoch
            return True
        return False

    @property
    def never_qualified(self) -> bool:
        """True when a gate is set and no epoch ever cleared it."""
        return bool(self.gate_iou) and not np.isfinite(self.best_epe)


def save_resume(out_dir: str, state, epoch: int, best_epe: float) -> None:
    """Write the 'last' full-state checkpoint + progress.json."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(
        os.path.abspath(os.path.join(out_dir, "last")),
        dict(params=state.params, batch_stats=state.batch_stats,
             opt_state=state.opt_state, step=np.asarray(state.step)),
        force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(out_dir, "progress.json"), "w") as fh:
        json.dump(dict(epoch=epoch, best_epe=best_epe), fh)


def load_resume(out_dir: str, state):
    """Restore (state, start_epoch, best_epe) from ``save_resume`` output.

    Returns (state, 0, inf) untouched when no progress.json exists, so
    callers can pass --resume unconditionally on a fresh directory.
    """
    meta_path = os.path.join(out_dir, "progress.json")
    if not os.path.exists(meta_path):
        return state, 0, float("inf")
    import orbax.checkpoint as ocp

    with open(meta_path) as fh:
        meta = json.load(fh)
    ckptr = ocp.StandardCheckpointer()
    target = dict(params=state.params, batch_stats=state.batch_stats,
                  opt_state=state.opt_state, step=np.zeros((), np.int32))
    restored = ckptr.restore(
        os.path.abspath(os.path.join(out_dir, "last")), target)
    state = state._replace(
        params=restored["params"], batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"], step=jnp.asarray(restored["step"]))
    return state, meta["epoch"] + 1, meta["best_epe"]


def batcher(frames: list, batch_size: int, seed_holder: list,
            keys=("pos1", "pos2", "gt", "s_fg_mask", "mask1")) -> Callable:
    """Epoch generator factory: shuffled, drop-last batches; the mutable
    ``seed_holder`` advances the shuffle seed per epoch (and survives
    resume — the caller seeds it with seed + start_epoch)."""

    def gen():
        rng = np.random.default_rng(seed_holder[0])
        seed_holder[0] += 1
        order = rng.permutation(len(frames))
        for s in range(0, len(order) - batch_size + 1, batch_size):
            items = [frames[int(i)] for i in order[s:s + batch_size]]
            yield {k: np.stack([it[k] for it in items]) for k in keys}

    return gen
