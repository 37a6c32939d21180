"""Per-op microbenchmarks at production scale, measured IN-SCAN.

Single-dispatch timings through the tunneled TPU runtime are dominated by
~25 ms dispatch overhead (docs/PERFORMANCE.md), so every candidate op is
timed inside a lax.scan whose carry perturbs the inputs (defeats CSE/
hoisting) — the same way the real pipeline runs.

Usage:  python scripts/microbench.py [name ...]   (default: all)

CALIBRATION: an EMPTY scan step costs ~0.82 ms on this runtime (measured:
bench "empty"); subtract it from every number below to get the true op
cost. E.g. xla-knn 1.92 -> 1.10 ms, banded_knn 1.33 -> 0.51 ms.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from ssf_slam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()

N = 8192
K = 16
ITERS = 32


def timed_scan(make_fn, n_iters=ITERS, reps=3):
    """make_fn() -> (step(carry) -> carry). Returns ms per iteration."""
    step = make_fn()

    @jax.jit
    def run(c0):
        def body(c, _):
            return step(c), None
        c, _ = jax.lax.scan(body, c0, None, length=n_iters)
        return c

    c0 = jnp.float32(0.0)
    out = run(c0)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(c0)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    return dt / n_iters * 1e3


def _cloud(n, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.uniform(-30, 30, (1, n, 3)).astype(np.float32))


def main(names):
    from ssf_slam_tpu.models.costvolume import _segment_softmax_sum
    from ssf_slam_tpu.ops.grouping import group_points
    from ssf_slam_tpu.ops.knn import knn

    q8 = _cloud(N, 0)
    t8 = _cloud(N, 1)
    t2 = _cloud(2048, 2)
    rngi = np.random.default_rng(3)
    idx8 = jnp.asarray(rngi.integers(0, N, (1, N, K)))
    feats = jnp.asarray(
        rngi.normal(size=(1, N, 64)).astype(np.float32))
    featsb = feats.astype(jnp.bfloat16)
    w = jnp.asarray(rngi.normal(size=(1, N * K, 1)).astype(np.float32))

    benches = {}

    def bench(name):
        def deco(f):
            benches[name] = f
            return f
        return deco

    @bench("empty")
    def b0():
        def step(c):
            return c + q8[0, 0, 0] * 0 + jnp.float32(1)
        return step

    @bench("knn_8192x8192_approx")
    def b1():
        def step(c):
            d, i = knn(q8 + c * 1e-6, t8, K, approx=True)
            return c + jnp.sum(d[..., 0]) * 0 + jnp.float32(1)
        return step

    @bench("knn_8192x8192_exact")
    def b1e():
        def step(c):
            d, i = knn(q8 + c * 1e-6, t8, K, approx=False)
            return c + jnp.sum(d[..., 0]) * 0 + jnp.float32(1)
        return step

    @bench("knn_8192x2048_approx")
    def b2():
        def step(c):
            d, i = knn(q8 + c * 1e-6, t2, K, approx=True)
            return c + jnp.sum(d[..., 0]) * 0 + jnp.float32(1)
        return step

    @bench("group_8192x16x64_f32")
    def b3():
        def step(c):
            g = group_points(feats + c * 0, idx8)
            return c + g[0, 0, 0, 0] * 0 + jnp.float32(1)
        return step

    @bench("group_8192x16x64_bf16")
    def b3b():
        def step(c):
            g = group_points(featsb + c.astype(jnp.bfloat16) * 0, idx8)
            return c + g[0, 0, 0, 0].astype(jnp.float32) * 0 + jnp.float32(1)
        return step

    @bench("segment_softmax_sum_l0")
    def b4():
        vals = feats.reshape(1, N, 64)
        vflat = jnp.broadcast_to(vals[:, :, None, :], (1, N, K, 64)).reshape(
            1, N * K, 64)
        ids = idx8.reshape(1, N * K)

        def step(c):
            out = jax.vmap(
                lambda v, ww, i: _segment_softmax_sum(v, ww, i, N)
            )(vflat + c * 0, w, ids)
            return c + out[0, 0, 0] * 0 + jnp.float32(1)
        return step

    @bench("tflow_fwd_bf16")
    def b5():
        from ssf_slam_tpu.config import FlowNetConfig
        from ssf_slam_tpu.models import TFlow

        cfg = FlowNetConfig(npoint=N, joint_seg=True, dtype="bfloat16")
        model = TFlow(cfg=cfg)
        variables = jax.jit(model.init)(jax.random.PRNGKey(0), q8, t8)

        def step(c):
            flows, _ = model.apply(variables, q8 + c * 1e-6, t8)
            return c + jnp.sum(flows[0][..., 0]) * 0 + jnp.float32(1)
        return step

    todo = names or list(benches)
    results = {}
    for name in todo:
        ms = timed_scan(benches[name])
        results[name] = ms
        print(f"{name:32s} {ms:8.3f} ms", flush=True)
    return results


def bench_banded():
    """Banded Pallas kernels at production scale (run on TPU)."""
    from ssf_slam_tpu.ops.banded import (
        banded_knn, banded_knn_group, banded_knn_idw,
    )
    from ssf_slam_tpu.ops.morton import morton_argsort

    rng = np.random.default_rng(0)
    pts = jnp.asarray(rng.uniform(-30, 30, (N, 3)).astype(np.float32))
    pts = pts[morton_argsort(pts)]
    t2 = jnp.asarray(rng.uniform(-30, 30, (2048, 3)).astype(np.float32))
    t2 = t2[morton_argsort(t2)]
    feats = jnp.asarray(rng.normal(size=(N, 64)).astype(np.float32))
    feats2 = jnp.asarray(rng.normal(size=(2048, 64)).astype(np.float32))

    results = {}

    def one(name, step):
        ms = timed_scan(lambda: step)
        results[name] = ms
        print(f"{name:32s} {ms:8.3f} ms", flush=True)

    one("banded_knn_8192x8192",
        lambda c: c + banded_knn(pts + c * 1e-6, pts, K)[0][0, 0] * 0 + 1)
    one("banded_knn_8192x2048",
        lambda c: c + banded_knn(pts + c * 1e-6, t2, K)[0][0, 0] * 0 + 1)
    one("banded_knn_group_8192x8192x64",
        lambda c: c + banded_knn_group(
            pts + c * 1e-6, pts, feats, K)[2][0, 0, 0] * 0 + 1)
    one("banded_knn_idw_8192x2048x64",
        lambda c: c + banded_knn_idw(
            pts + c * 1e-6, t2, feats2, 3)[0][0, 0] * 0 + 1)
    return results


if __name__ == "__main__":
    if "banded" in sys.argv[1:]:
        bench_banded()
    else:
        main(sys.argv[1:])
