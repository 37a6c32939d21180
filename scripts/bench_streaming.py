"""Online-engine throughput/latency bench (run on the chip).

Measures the two live engines at the full 8192-pt SSF operating point:

- ``engine/streaming.py::StreamingRunner`` — single-sequence per-arriving-
  scan loop, swept over pipeline_depth in {1, 2, 4} (depth 1 = the round-3
  strictly-synchronous dispatch, the 18 Hz baseline);
- ``parallel/mesh.py::run_sequences_sharded_streaming`` — the multi-
  sequence shard_map engine on a 1-device mesh (per-seq rate is the number
  that generalizes to one-sequence-per-device slices).

Reports sustained Hz and completion-latency mean/p95 per configuration —
the round-4 target is >= 35 Hz/seq (vs the ~110 scans/s in-scan batch step
and the reference's 10 Hz live loop, scripts/PointCloudOdometry.py:42).

Usage: python scripts/bench_streaming.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ssf_slam_tpu.utils.cache import enable_compilation_cache

N_POINTS = 8192
N_FRAMES = 64


def main() -> None:
    enable_compilation_cache()
    from jax.sharding import Mesh

    from ssf_slam_tpu.config import FlowNetConfig, PipelineConfig, Variant
    from ssf_slam_tpu.data.synthetic import generate_sequence
    from ssf_slam_tpu.engine.streaming import StreamingRunner
    from ssf_slam_tpu.models import TFlow
    from ssf_slam_tpu.parallel.mesh import run_sequences_sharded_streaming

    cfg = PipelineConfig(variant=Variant.SSF)
    net_cfg = FlowNetConfig(npoint=N_POINTS, joint_seg=True, dtype="bfloat16",
                            neighbor_backend="banded")
    model = TFlow(cfg=net_cfg)
    pc = jnp.zeros((1, N_POINTS, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), pc, pc)

    frames = generate_sequence(n_frames=N_FRAMES, n_points=N_POINTS, seed=0,
                               noise=0.004, n_moving=4)

    print(f"single-sequence StreamingRunner, {N_FRAMES} scans x "
          f"{N_POINTS} pts:")
    for depth in (1, 2, 4):
        runner = StreamingRunner(model, variables, cfg,
                                 pipeline_depth=depth)
        stats = runner.run(iter(frames))
        print(f"  depth={depth}: {stats['hz']:6.1f} Hz  latency mean "
              f"{stats['latency_ms_mean']:5.1f} ms  p95 "
              f"{stats['latency_ms_p95']:5.1f} ms", flush=True)

    # sharded online engine, 1-device mesh (per-seq rate == slice-design Hz)
    devs = np.array(jax.devices()[:1])
    mesh = Mesh(devs, ("seq",))

    def blocks():
        for k, f in enumerate(frames):
            yield k, dict(pos1=f["pos1"][None], mask1=f["mask1"][None],
                          time=np.full((1, 1), f["time"], np.float32))

    for depth in (1, 2, 4):
        t0 = time.perf_counter()
        _, outs, stats = run_sequences_sharded_streaming(
            blocks(), cfg, mesh, model, variables, pipeline_depth=depth)
        print(f"sharded depth={depth}: {stats['hz_per_seq']:6.1f} Hz/seq  "
              f"latency mean {stats['latency_ms_mean']:5.1f} ms  p95 "
              f"{stats['latency_ms_p95']:5.1f} ms", flush=True)


if __name__ == "__main__":
    main()
