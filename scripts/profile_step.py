"""Stage-level profile of the fused SSF step on the real chip.

Times, inside a lax.scan with a perturbing carry (same methodology as
scripts/microbench.py):
  - net:     TFlow forward alone (banded + bf16, the bench config)
  - slam:    slam_step alone, fed precomputed flow (geometry+mapping path)
  - fused:   the full fused step (net + slam)
Splitting tells us where the remaining ms per scan live.

Usage: python scripts/profile_step.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from ssf_slam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N = 8192
ITERS = 16


def timeit(name, run, state0, scans):
    out = run(state0, scans)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    t0 = time.perf_counter()
    out = run(state0, scans)
    jax.block_until_ready(jax.tree.leaves(out)[0])
    dt = (time.perf_counter() - t0) / ITERS * 1e3
    print(f"{name:28s} {dt:8.3f} ms/scan")
    return dt


def main():
    from ssf_slam_tpu.config import FlowNetConfig, PipelineConfig, Variant
    from ssf_slam_tpu.data.synthetic import generate_sequence
    from ssf_slam_tpu.engine.fused import make_fused_step
    from ssf_slam_tpu.engine.pipeline import init_slam_state, slam_step
    from ssf_slam_tpu.models import TFlow

    frames = generate_sequence(n_frames=ITERS, n_points=N, seed=0,
                               noise=0.004, n_moving=4)
    scans = dict(
        points=jnp.asarray(np.stack([f["pos1"] for f in frames])),
        prev=jnp.asarray(np.stack(
            [frames[max(k - 1, 0)]["pos1"] for k in range(len(frames))])),
        mask=jnp.asarray(np.stack([f["mask1"].astype(bool) for f in frames])),
        prev_mask=jnp.asarray(np.stack(
            [frames[max(k - 1, 0)]["mask1"].astype(bool)
             for k in range(len(frames))])),
        time=jnp.asarray([f["time"] for f in frames], jnp.float32),
        flow=jnp.asarray(np.stack([f["gt"] for f in frames])),
    )

    cfg = PipelineConfig(variant=Variant.SSF)
    net_cfg = FlowNetConfig(npoint=N, joint_seg=True, dtype="bfloat16",
                            neighbor_backend="banded")
    model = TFlow(cfg=net_cfg)
    rng = jax.random.PRNGKey(0)
    pc = jnp.zeros((1, N, 3))
    variables = jax.jit(model.init)(rng, pc, pc)

    # --- net only
    @jax.jit
    def run_net(c, sc):
        def step(c, s):
            flows, _ = model.apply(variables, s["prev"][None] + c * 1e-7,
                                   s["points"][None])
            return c + 1.0, flows[0][0, 0, 0]

        return jax.lax.scan(step, c, sc)

    timeit("net (TFlow bf16 banded)", run_net, jnp.float32(0.0), scans)

    # --- xla-backend net for comparison (slow compile; opt-in)
    if "--xla" in sys.argv:
        import dataclasses
        model_x = TFlow(
            cfg=dataclasses.replace(net_cfg, neighbor_backend="xla"))

        @jax.jit
        def run_net_x(c, sc):
            def step(c, s):
                flows, _ = model_x.apply(variables, s["prev"][None] + c * 1e-7,
                                         s["points"][None])
                return c + 1.0, flows[0][0, 0, 0]

            return jax.lax.scan(step, c, sc)

        timeit("net (TFlow bf16 xla)", run_net_x, jnp.float32(0.0), scans)

    if "--trace" in sys.argv:
        with jax.profiler.trace("/tmp/ssf_trace"):
            out = run_net(jnp.float32(0.0), scans)
            jax.block_until_ready(jax.tree.leaves(out)[0])
        print("trace written to /tmp/ssf_trace")
        return

    # --- geometry/mapping path alone (SF variant w/ GT flow as pred)
    run_cfg = cfg.replace(variant=Variant.SEG)
    state0 = init_slam_state(run_cfg)

    @jax.jit
    def run_slam(state, sc):
        def step(state, s):
            slam_scan = dict(points=s["points"], mask=s["mask"],
                             time=s["time"], flow_points=s["prev"],
                             flow_mask=s["prev_mask"], flow=s["flow"],
                             static_mask=s["flow"][:, 0] < 1e9)
            return slam_step(state, slam_scan, run_cfg)

        return jax.lax.scan(step, state, sc)

    timeit("slam_step (geometry+map)", run_slam, state0, scans)

    # --- full fused (tower-cached)
    from ssf_slam_tpu.engine.fused import sequence_box

    box = sequence_box(np.asarray(scans["points"]))
    fused_step, fused_cfg, make_carry = make_fused_step(model, variables,
                                                        cfg, box=box)
    fscans = {k: v for k, v in scans.items() if k != "flow"}

    @jax.jit
    def run_fused(sc):
        return jax.lax.scan(fused_step, make_carry(sc["prev"][0]), sc)

    timeit("fused (net+slam)", run_fused, fscans)


if __name__ == "__main__":
    main()
