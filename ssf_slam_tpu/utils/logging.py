"""Run logging / observability.

Replaces the reference's ad-hoc stack — IOStream text logger
(main_sju_occ_ros.py:50-60), TensorBoardX scalars (:314-318,374-385), and the
experiment-dir source snapshot (:67-86) — with one RunLogger: line-logging to
run.log, JSONL metric streaming (machine-readable, replaces TB scalars; an
optional torch TensorBoard writer attaches when available), and a config
snapshot. Also exposes the jax.profiler trace hook for the "tracing" aux
subsystem.
"""

from __future__ import annotations

import contextlib
import dataclasses
import json
import os
import time
from typing import Any, Optional


class RunLogger:
    def __init__(self, run_dir: str, tensorboard: bool = False):
        os.makedirs(run_dir, exist_ok=True)
        self.run_dir = run_dir
        self._log = open(os.path.join(run_dir, "run.log"), "a")
        self._metrics = open(os.path.join(run_dir, "metrics.jsonl"), "a")
        self._tb = None
        if tensorboard:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(os.path.join(run_dir, "tb"))
            except Exception:
                self._tb = None

    def cprint(self, msg: str) -> None:
        """IOStream.cprint equivalent: stdout + file."""
        stamp = time.strftime("%H:%M:%S")
        line = f"[{stamp}] {msg}"
        print(line, flush=True)
        self._log.write(line + "\n")
        self._log.flush()

    def metrics(self, step: int, **scalars: float) -> None:
        rec = {"step": int(step), "time": time.time()}
        rec.update({k: float(v) for k, v in scalars.items()})
        self._metrics.write(json.dumps(rec) + "\n")
        self._metrics.flush()
        if self._tb is not None:
            for k, v in scalars.items():
                self._tb.add_scalar(k, float(v), step)

    def snapshot_config(self, cfg: Any) -> None:
        """Persist the full config (the source-backup equivalent)."""
        path = os.path.join(self.run_dir, "config.json")
        with open(path, "w") as f:
            json.dump(_to_jsonable(cfg), f, indent=2, default=str)

    def close(self) -> None:
        self._log.close()
        self._metrics.close()
        if self._tb is not None:
            self._tb.close()


def _to_jsonable(obj: Any):
    if dataclasses.is_dataclass(obj):
        return {
            f.name: _to_jsonable(getattr(obj, f.name))
            for f in dataclasses.fields(obj)
        }
    if isinstance(obj, dict):
        return {k: _to_jsonable(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_to_jsonable(x) for x in obj]
    return obj


@contextlib.contextmanager
def profile_trace(out_dir: Optional[str]):
    """jax.profiler trace scope (perfetto-compatible); no-op when out_dir None."""
    import jax

    if out_dir is None:
        yield
        return
    jax.profiler.start_trace(out_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
