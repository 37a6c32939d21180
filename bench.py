"""Headline benchmark: full SSF pipeline throughput on one chip.

Measures scans/sec of the fused per-scan step — TFlow scene-flow inference
(joint flow+seg co-estimation, 8192 points) + static-mask ego-motion SVD +
feature extraction + keyframe mapping — scanned over a synthetic CARLA-style
sequence. This is the BASELINE.json north-star configuration; the reference
pipeline paces the same work at 10 Hz by construction
(scripts/PointCloudOdometry.py:42).

Prints ONE JSON line:
    {"metric": "ssf_scans_per_sec", "value": N, "unit": "scans/s",
     "vs_baseline": N/100}
(vs_baseline: >= 1.0 meets the >=100 scans/sec/chip target.)
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ssf_slam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N_POINTS = 8192
N_FRAMES = 32

# Transient-failure guard: the round-2 driver capture died to a one-off
# TPU-backend FAILED_PRECONDITION mid-scan (BENCH_r02.json rc=1) that did not
# reproduce on rerun. A wedged backend cannot be rebuilt in-process, so on
# any runtime error the bench re-execs itself in a FRESH process (fresh
# client, fresh tunnel connection) up to _MAX_RETRIES times before failing.
_RETRY_ENV = "SSF_BENCH_RETRY"
_MAX_RETRIES = 2

# Hang guard: a wedged TPU tunnel can block device init (jax.devices())
# FOREVER with ~zero CPU — observed round 3: even a trivial probe hung, no
# exception ever raised, so the exception-retry path never fires. The
# watchdog re-execs a fresh process (same budget as the exception path) if
# the bench hasn't finished warmup within _WATCHDOG_SECS. Generous: a COLD
# compile of the fused graphs takes minutes through the remote-compile
# tunnel; a healthy warm run warms up in well under a minute.
_WATCHDOG_SECS = float(os.environ.get("SSF_BENCH_WATCHDOG", "1500"))

# Optional: measure the opt-in seg-gated geometric refinement operating
# point (odometry/flow_refine.py) instead of the default SSF step.
_GEOM_REFINE = os.environ.get("SSF_BENCH_GEOM_REFINE", "") == "1"
# A/B toggle for the attention+weightnet+aggregation super-fusion
# (measured negative; config.py note — default off)
_FUSE_ATT = os.environ.get("SSF_BENCH_FUSE_ATTENTION", "0") == "1"


def build_pipeline(scan_points: np.ndarray):
    from ssf_slam_tpu.config import FlowNetConfig, PipelineConfig, Variant
    from ssf_slam_tpu.models import TFlow

    cfg = PipelineConfig(variant=Variant.SSF)
    if _GEOM_REFINE:
        import dataclasses

        cfg = cfg.replace(
            egomotion=dataclasses.replace(cfg.egomotion, geom_refine=True))
    # bfloat16 feature compute: the geometry path (kNN distances, ego-motion
    # SVD, mapping) stays float32 via the GEOM precision policy.
    # banded: Morton-sorted Pallas neighbor kernels (ops/banded.py).
    net_cfg = FlowNetConfig(npoint=N_POINTS, joint_seg=True, dtype="bfloat16",
                            neighbor_backend="banded",
                            fuse_attention=_FUSE_ATT)
    model = TFlow(cfg=net_cfg)
    rng = jax.random.PRNGKey(0)
    pc = jnp.zeros((1, N_POINTS, 3))
    variables = jax.jit(model.init)(rng, pc, pc)

    from ssf_slam_tpu.engine.fused import make_fused_step, sequence_box

    # sequence-stable Morton box: required by tower caching (banded towers
    # sorted under one box are reusable across scan steps only if every
    # step shares that box)
    box = sequence_box(scan_points)
    fused_step, run_cfg, make_carry = make_fused_step(model, variables, cfg,
                                                      box=box)

    def run(scans):
        carry = make_carry(scans["prev"][0])
        return jax.lax.scan(fused_step, carry, scans)

    return run_cfg, jax.jit(run)


def main(cancel_watchdog=lambda: None) -> None:
    from ssf_slam_tpu.data.synthetic import generate_sequence

    frames = generate_sequence(
        n_frames=N_FRAMES, n_points=N_POINTS, seed=0, noise=0.004, n_moving=4
    )
    scans = dict(
        points=jnp.asarray(np.stack([f["pos1"] for f in frames])),
        prev=jnp.asarray(np.stack(
            [frames[max(k - 1, 0)]["pos1"] for k in range(len(frames))])),
        mask=jnp.asarray(np.stack([f["mask1"].astype(bool) for f in frames])),
        prev_mask=jnp.asarray(np.stack(
            [frames[max(k - 1, 0)]["mask1"].astype(bool)
             for k in range(len(frames))])),
        time=jnp.asarray([f["time"] for f in frames], jnp.float32),
    )

    cfg, run = build_pipeline(np.asarray(scans["points"]))

    # compile + warmup
    _, outs = run(scans)
    jax.block_until_ready(outs["pose_t"])
    cancel_watchdog()  # past the hang-prone init/compile stage

    n_rep = 3
    t0 = time.perf_counter()
    for _ in range(n_rep):
        _, outs = run(scans)
        jax.block_until_ready(outs["pose_t"])
    dt = (time.perf_counter() - t0) / n_rep

    scans_per_sec = N_FRAMES / dt
    print(
        json.dumps(
            {
                "metric": "ssf_scans_per_sec",
                "value": round(scans_per_sec, 2),
                "unit": "scans/s",
                "vs_baseline": round(scans_per_sec / 100.0, 3),
            }
        )
    )


def _reexec(attempt: int, why: str) -> None:
    print(
        f"bench attempt {attempt + 1} {why}; re-execing fresh process",
        file=sys.stderr, flush=True,
    )
    env = dict(os.environ, **{_RETRY_ENV: str(attempt + 1)})
    os.execve(sys.executable, [sys.executable, os.path.abspath(__file__)],
              env)


def main_with_retry() -> None:
    import threading

    attempt = int(os.environ.get(_RETRY_ENV, "0"))

    def on_hang():
        # device init / compile wedged with no exception (hung tunnel).
        # exec from the watchdog thread replaces the whole process; if the
        # budget is spent, exit nonzero so the driver records a failure
        # instead of blocking on a corpse.
        if attempt >= _MAX_RETRIES:
            print(f"bench attempt {attempt + 1} hung >{_WATCHDOG_SECS:.0f}s; "
                  "retry budget spent", file=sys.stderr, flush=True)
            os._exit(17)
        _reexec(attempt, f"hung >{_WATCHDOG_SECS:.0f}s (wedged backend?)")

    watchdog = threading.Timer(_WATCHDOG_SECS, on_hang)
    watchdog.daemon = True
    watchdog.start()
    try:
        main(cancel_watchdog=watchdog.cancel)
    except Exception as exc:  # noqa: BLE001 — any backend/runtime flake
        watchdog.cancel()
        if attempt >= _MAX_RETRIES:
            raise
        _reexec(attempt, f"failed ({type(exc).__name__}: {exc})")


if __name__ == "__main__":
    main_with_retry()
