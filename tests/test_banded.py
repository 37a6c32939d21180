"""Banded (Morton) Pallas neighbor engine: kernel equivalence + VJP tests.

Kernels run in interpret mode on CPU; the numerical contracts here are the
correctness guarantees the TFlow fast path (FlowNetConfig.neighbor_backend=
"banded") relies on:
- banded kNN recall vs the exact kNN oracle on lidar-like clouds;
- grouping / regrouping is EXACT (one-hot matmuls are copies);
- the scatter softmax-sum matches the XLA segment-op implementation;
- custom VJPs match the reference autograd surface (features-only grads for
  grouping/interp, full grads for the scatter softmax).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from ssf_slam_tpu.ops import neighbors as nb
from ssf_slam_tpu.ops.grouping import group_points
from ssf_slam_tpu.ops.knn import knn


@pytest.fixture(autouse=True, scope="module")
def _interpret():
    with pltpu.force_tpu_interpret_mode():
        yield


def _lidar_cloud(rng, n):
    """Ring-structured cloud (annulus + ground) — the banded engine's recall
    depends on realistic spatial density, not uniform boxes."""
    r = rng.uniform(3, 28, n)
    th = rng.uniform(0, 2 * np.pi, n)
    z = rng.normal(0, 1.5, n)
    return np.stack([r * np.cos(th), r * np.sin(th), z], 1).astype(np.float32)


B, N, M, K, C = 2, 1024, 2048, 8, 16


@pytest.fixture(scope="module")
def clouds():
    """Morton-sorted query/target batch sharing an adaptive box — exactly
    the invariant TFlow's stem establishes before any banded call."""
    rng = np.random.default_rng(0)
    q0 = np.stack([_lidar_cloud(rng, N) for _ in range(B)])
    p0 = np.stack([_lidar_cloud(rng, M) for _ in range(B)])
    box = nb.cloud_box(jnp.asarray(q0), jnp.asarray(p0))
    q, _ = nb.morton_sort(jnp.asarray(q0), box=box)
    p, _ = nb.morton_sort(jnp.asarray(p0), box=box)
    f = jnp.asarray(rng.normal(size=(B, M, C)).astype(np.float32))
    return q, p, f, box


def test_band_params_static():
    assert nb.band_params(8192, 8192, 16) == (256, 256, 3)
    assert nb.band_params(2048, 512, 16) == (256, 128, 3)
    assert nb.band_params(256, 512, 16) is None  # too small
    assert nb.band_params(2048, 2048, 64) is None  # k too large


def test_knn_group_recall_and_exact_grouping(clouds):
    q, p, f, box = clouds
    idx, grouped, plan, params = nb.nn_knn_group(q, p, f, K, backend="banded",
                                                 box=box)
    assert params is not None
    # grouping is exact for whatever indices were selected
    np.testing.assert_array_equal(
        np.asarray(grouped), np.asarray(group_points(f, idx)))
    # recall vs exact kNN
    _, i_ex = knn(q, p, K)
    i_b, i_e = np.asarray(idx), np.asarray(i_ex)
    hits = sum(
        len(set(i_b[b, i]) & set(i_e[b, i]))
        for b in range(B) for i in range(N)
    )
    recall = hits / (B * N * K)
    assert recall > 0.9, recall


def test_knn_group_grad_matches_oracle(clouds):
    q, p, f, box = clouds

    def loss(f):
        idx, g, _, _ = nb.nn_knn_group(q, p, f, K, backend="banded", box=box)
        return jnp.sum(g**2), idx

    (_, idx), gf = jax.value_and_grad(loss, has_aux=True)(f)
    ct = 2 * group_points(f, idx)
    gf_ref = jax.vmap(
        lambda i, v: jax.ops.segment_sum(
            v.reshape(-1, C), i.reshape(-1), num_segments=M)
    )(idx, ct)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gf_ref), rtol=1e-6)


def test_regroup_exact(clouds):
    q, p, f, box = clouds
    idx, _, plan, params = nb.nn_knn_group(q, p, f, K, backend="banded",
                                           box=box)
    g2 = jnp.asarray(np.random.default_rng(1).normal(
        size=(B, M, 7)).astype(np.float32))
    out = nb.nn_regroup(g2, idx, plan, params)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(group_points(g2, idx)))


def test_knn_idw_matches_xla_on_shared_neighbors(clouds):
    q, p, _, box = clouds
    fields = jnp.asarray(np.random.default_rng(2).normal(
        size=(B, M, 4)).astype(np.float32))
    out = nb.nn_knn_idw(q, p, fields, 3, backend="banded", box=box)
    assert out.shape == (B, N, 4)
    assert bool(jnp.all(jnp.isfinite(out)))
    # against a banded-index oracle: recompute idw from the kernel's own
    # neighbor set (first-NN recall is ~1.0, so spot-check magnitudes only)
    out_x = nb.nn_knn_idw(q, p, fields, 3, backend="xla")
    # the two neighbor sets differ slightly; interpolated fields of smooth
    # random data should still agree closely in the mean
    err = float(jnp.mean(jnp.abs(out - out_x)))
    scale = float(jnp.mean(jnp.abs(out_x)))
    assert err < 0.35 * scale, (err, scale)


def test_scatter_softmax_sum_matches_xla(clouds):
    q, p, f, box = clouds
    rng = np.random.default_rng(3)
    idx, _, plan, params = nb.nn_knn_group(q, p, f, K, backend="banded",
                                           box=box)
    vals = jnp.asarray(rng.normal(size=(B, N, K, C)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(B, N, K)).astype(np.float32))
    out_b = nb.nn_scatter_softmax_sum(vals, w, idx, M, plan, params)
    out_x = nb.nn_scatter_softmax_sum(vals, w, idx, M, None, None)
    np.testing.assert_allclose(
        np.asarray(out_b), np.asarray(out_x), atol=2e-5)

    def lb(vals, w):
        return jnp.sum(nb.nn_scatter_softmax_sum(vals, w, idx, M, plan,
                                                 params) ** 2)

    def lx(vals, w):
        return jnp.sum(nb.nn_scatter_softmax_sum(vals, w, idx, M, None,
                                                 None) ** 2)

    gv_b, gw_b = jax.grad(lb, argnums=(0, 1))(vals, w)
    gv_x, gw_x = jax.grad(lx, argnums=(0, 1))(vals, w)
    np.testing.assert_allclose(np.asarray(gv_b), np.asarray(gv_x), atol=2e-4)
    np.testing.assert_allclose(np.asarray(gw_b), np.asarray(gw_x), atol=2e-4)


def test_near_sorted_target_warp_case(clouds):
    """point_warping targets (pos1 + flow) are only near-Morton-sorted;
    recall must survive realistic flow magnitudes."""
    q, p, _, box = clouds
    rng = np.random.default_rng(4)
    flow = jnp.asarray(rng.normal(0, 0.5, (B, M, 3)).astype(np.float32))
    target = p + flow  # near-sorted
    idx, _, _, params = nb.nn_knn_group(
        q, target, jnp.concatenate([target, flow], -1), K, backend="banded",
        box=box)
    assert params is not None
    _, i_ex = knn(q, target, K)
    i_b, i_e = np.asarray(idx), np.asarray(i_ex)
    hits = sum(
        len(set(i_b[b, i]) & set(i_e[b, i]))
        for b in range(B) for i in range(0, N, 3)
    )
    recall = hits / (B * len(range(0, N, 3)) * K)
    assert recall > 0.85, recall


def test_fused_attention_matches_xla():
    """Fused attention kernel == XLA reference (forward and gradients)."""
    from ssf_slam_tpu.ops.attention import (
        attention_fused,
        attention_xla,
    )

    rng = np.random.default_rng(7)
    q = jnp.asarray(rng.normal(size=(2, 256, 8, 32)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(2, 256, 8, 32)).astype(np.float32))
    qa_x, ka_x = attention_xla(q, k)
    qa_f, ka_f = attention_fused(q, k)
    np.testing.assert_allclose(np.asarray(qa_f), np.asarray(qa_x),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(ka_f), np.asarray(ka_x),
                               rtol=2e-5, atol=2e-5)

    def lf(q, k):
        a, b = attention_fused(q, k)
        return jnp.sum(a * a) + jnp.sum(jnp.abs(b))

    def lx(q, k):
        a, b = attention_xla(q, k)
        return jnp.sum(a * a) + jnp.sum(jnp.abs(b))

    gq_f, gk_f = jax.grad(lf, argnums=(0, 1))(q, k)
    gq_x, gk_x = jax.grad(lx, argnums=(0, 1))(q, k)
    np.testing.assert_allclose(np.asarray(gq_f), np.asarray(gq_x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(gk_f), np.asarray(gk_x),
                               rtol=1e-4, atol=1e-4)


def test_morton_sort_roundtrip():
    rng = np.random.default_rng(5)
    pts = jnp.asarray(rng.uniform(-30, 30, (3, 512, 3)).astype(np.float32))
    srt, perm = nb.morton_sort(pts)
    inv = nb.invert_permutation(perm)
    back = jnp.take_along_axis(srt, inv[..., None], axis=-2)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(pts))
