"""Chip smoke of the point-shard BANDED backend (round-4 verdict weak #7).

The ``backend="banded"`` path in parallel/pointshard.py had only executed
in Pallas interpret mode on the virtual CPU mesh; this runs the COMPILED
kernels on the real chip — a single-device mesh (the only real-TPU mesh in
this environment), 8192 points, k=16 — and scores neighbor recall + group
fidelity against the brute-force oracle.

    python scripts/pointshard_chip_smoke.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from ssf_slam_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()


def main() -> int:
    from jax.sharding import Mesh

    from ssf_slam_tpu.ops.knn import knn as xla_knn
    from ssf_slam_tpu.ops.neighbors import cloud_box, morton_sort
    from ssf_slam_tpu.parallel.pointshard import pointsharded_knn_group

    dev = jax.devices()[0]
    print(f"device: {dev}", file=sys.stderr)
    mesh = Mesh(np.asarray(jax.devices()[:1]), ("seq",))

    n, k = 8192, 16
    rng = np.random.default_rng(0)
    # LiDAR-like street scan (the workload the recall contract is written
    # for — a uniform volume cloud has less Morton locality and measures
    # ~0.88 on the SINGLE-chip banded engine too; the claim under test is
    # that sharding loses nothing vs that engine, plus an absolute floor
    # on representative data)
    from ssf_slam_tpu.data.synthetic import generate_sequence

    fr = generate_sequence(n_frames=2, n_points=n, seed=0, n_moving=4,
                           radius=30.0)[0]
    q = jnp.asarray(np.asarray(fr["pos1"], np.float32))
    feats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))

    d_b, i_b, g_b = pointsharded_knn_group(q, q, feats, k, mesh,
                                           halo=512, backend="banded")
    jax.block_until_ready(d_b)
    t0 = time.perf_counter()
    d_b, i_b, g_b = pointsharded_knn_group(q, q, feats, k, mesh,
                                           halo=512, backend="banded")
    jax.block_until_ready(d_b)
    dt_ms = (time.perf_counter() - t0) * 1e3

    # oracle: exact kNN (indices in original order); translate the banded
    # result's Morton-order indices back through the sort permutation
    d_o, i_o = xla_knn(q, q, k)
    box = cloud_box(q, q)
    _, perm = morton_sort(q, box=box)
    i_o_sorted = jnp.argsort(perm)[i_o]  # oracle idx -> Morton row

    i_b_np, i_o_np = np.asarray(i_b), np.asarray(i_o_sorted)
    hits = sum(len(set(i_b_np[i]) & set(i_o_np[i])) for i in range(0, n, 4))
    recall = hits / (len(range(0, n, 4)) * k)

    # single-chip banded engine on the SAME (Morton-sorted) pair: the
    # sharded path must match its recall (sharding loses nothing)
    from ssf_slam_tpu.ops.neighbors import nn_knn

    q_sorted, _ = morton_sort(q, box=box)
    _, i_s = nn_knn(q_sorted, q_sorted, k, backend="banded", box=box)
    # i_s rows are Morton QUERY rows; oracle rows are original order —
    # align via the inverse permutation (values on both sides: Morton rows)
    i_s_np = np.asarray(i_s)
    inv_perm = np.asarray(jnp.argsort(perm))  # original idx -> Morton row
    hits_s = sum(len(set(i_s_np[inv_perm[i]]) & set(i_o_np[i]))
                 for i in range(0, n, 4))
    recall_single = hits_s / (len(range(0, n, 4)) * k)

    # grouped rows must be exact copies of the Morton-sorted features
    f_sorted = np.asarray(feats)[np.asarray(perm)]
    g_err = float(np.abs(np.asarray(g_b) - f_sorted[i_b_np]).max())

    # self-NN sanity: nearest neighbor of each point is itself (d=0)
    d0 = float(np.asarray(d_b)[:, 0].max())

    result = dict(metric="pointshard_banded_chip", n=n, k=k,
                  recall=round(float(recall), 4),
                  recall_single_chip=round(float(recall_single), 4),
                  group_err=g_err,
                  self_nn_max_d2=d0, wall_ms=round(dt_ms, 2),
                  compiled=True)
    print(json.dumps(result))
    assert recall > 0.9, f"banded recall {recall:.3f} < 0.9 on chip"
    assert recall > recall_single - 0.02, (
        f"sharding lost recall: {recall:.3f} vs single-chip "
        f"{recall_single:.3f}")
    # grouped rows carry the indexed features through the kernel's bf16
    # feature payload (by design — the model's features are bf16):
    # expect ~1e-2 rounding on N(0,1) values, not structural mismatch
    assert g_err < 0.05, f"grouped rows differ from target features ({g_err})"
    assert d0 < 1e-3, f"self-NN distance {d0}"
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
