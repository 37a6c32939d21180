"""Within-chip sequence batching economics: aggregate scans/s vs batch B.

The production multi-sequence design is one-sequence-per-DEVICE
(parallel/mesh.py::run_sequences_sharded, shard_map) on the thesis that a
single 8192-point fused SSF step already saturates one chip — so within-chip
batching buys nothing and cross-sequence batching must happen across
devices. This script MEASURES that thesis on the real chip: it vmaps the
fused SSF step (TFlow flow+seg inference + ego-motion + mapping) over
B in {1, 2, 4, 8} sequences and reports aggregate throughput.

vmap caveats (why this is the small-mapping configuration): vmap lowers
``lax.cond`` to select, so both branches of every mapping event execute for
every frame — loop closure stays OFF and scan-to-map refine OFF, exactly as
documented for ``run_sequences_batched`` (docs/PERFORMANCE.md). The sharded
engine keeps real branches; this experiment isolates the compute-saturation
question only.

Run on the chip:  python scripts/batch_economics.py
Appends nothing; prints a markdown table for docs/PERFORMANCE.md.
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
N_FRAMES = 16
BATCHES = (1, 2, 4, 8)


def main() -> None:
    enable_compilation_cache()
    from ssf_slam_tpu.config import (FlowNetConfig, MappingConfig,
                                     PipelineConfig, Variant)
    from ssf_slam_tpu.data.synthetic import generate_sequence
    from ssf_slam_tpu.engine.fused import (make_fused_step, sequence_box,
                                           stack_fused_scans)
    from ssf_slam_tpu.models import TFlow

    cfg = PipelineConfig(
        variant=Variant.SSF,
        mapping=MappingConfig(enable_loop_closure=False,
                              scan_to_map_refine=False),
    )
    net_cfg = FlowNetConfig(npoint=N_POINTS, joint_seg=True, dtype="bfloat16",
                            neighbor_backend="banded")
    model = TFlow(cfg=net_cfg)
    pc = jnp.zeros((1, N_POINTS, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), pc, pc)

    max_b = max(BATCHES)
    seqs = [
        generate_sequence(n_frames=N_FRAMES, n_points=N_POINTS, seed=100 + b,
                          noise=0.004, n_moving=4)
        for b in range(max_b)
    ]
    stacked = [stack_fused_scans(seq, N_POINTS) for seq in seqs]
    all_scans = {k: jnp.stack([s[k] for s in stacked]) for k in stacked[0]}
    box = sequence_box(np.asarray(all_scans["points"]))
    fused_step, _, make_carry = make_fused_step(model, variables, cfg,
                                                box=box)

    def one_sequence(seq_scans):
        carry = make_carry(seq_scans["prev"][0])
        return jax.lax.scan(fused_step, carry, seq_scans)

    rows = []
    for b in BATCHES:
        scans_b = {k: v[:b] for k, v in all_scans.items()}
        run = jax.jit(jax.vmap(one_sequence))
        _, outs = run(scans_b)  # compile + warm
        jax.block_until_ready(outs["pose_t"])
        n_rep = 3
        t0 = time.perf_counter()
        for _ in range(n_rep):
            _, outs = run(scans_b)
            jax.block_until_ready(outs["pose_t"])
        dt = (time.perf_counter() - t0) / n_rep
        agg = b * N_FRAMES / dt
        rows.append((b, agg, agg / b))
        print(f"B={b}: aggregate {agg:8.1f} scans/s   per-seq {agg/b:7.1f} "
              f"scans/s", flush=True)

    base = rows[0][1]
    print("\n| B | aggregate scans/s | per-seq scans/s | scaling vs B=1 |")
    print("|---|---|---|---|")
    for b, agg, per in rows:
        print(f"| {b} | {agg:.1f} | {per:.1f} | {agg / base:.2f}x |")


if __name__ == "__main__":
    main()
