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


def test_cost_attention_superfusion_matches_xla():
    """attention+weightnet+fwd-aggregation super-kernel == XLA reference."""
    from ssf_slam_tpu.ops.attention import (
        cost_attention_fused,
        cost_attention_xla,
    )

    rng = np.random.default_rng(11)
    B, N, K, C = 2, 256, 8, 32
    q = jnp.asarray(rng.normal(size=(B, N, K, C)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(B, N, K, C)).astype(np.float32))
    qc = jnp.asarray(rng.normal(size=(B, N, K, C)).astype(np.float32))
    wn = tuple(
        jnp.asarray(rng.normal(size=s, scale=0.3).astype(np.float32))
        for s in [(C, C), (C,), (C, C // 2), (C // 2,), (C // 2, 1), (1,)]
    )
    cf_x, wk_x = cost_attention_xla(q, k, qc, wn)
    cf_f, wk_f = cost_attention_fused(q, k, qc, wn)
    np.testing.assert_allclose(np.asarray(cf_f), np.asarray(cf_x),
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(wk_f), np.asarray(wk_x),
                               rtol=2e-4, atol=2e-4)

    def loss(fn):
        def go(q, k, qc):
            a, b = fn(q, k, qc, wn)
            return jnp.sum(a * a) + jnp.sum(jnp.abs(b))
        return go

    g_f = jax.grad(loss(cost_attention_fused), argnums=(0, 1, 2))(q, k, qc)
    g_x = jax.grad(loss(cost_attention_xla), argnums=(0, 1, 2))(q, k, qc)
    for a, b in zip(g_f, g_x):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-4)


def test_fold_weightnet_matches_sequential():
    """BN folding == the inference-mode Dense/BN/relu Sequential."""
    import flax.linen as nn

    from ssf_slam_tpu.ops.attention import fold_weightnet

    C = 16

    class WN(nn.Module):
        @nn.compact
        def __call__(self, x):
            return nn.Sequential([
                nn.Dense(C, use_bias=False),
                nn.BatchNorm(use_running_average=True, momentum=0.9,
                             epsilon=1e-3),
                nn.relu,
                nn.Dense(C // 2, use_bias=False),
                nn.BatchNorm(use_running_average=True, momentum=0.9,
                             epsilon=1e-3),
                nn.relu,
                nn.Dense(1),
            ])(x)

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(64, C)).astype(np.float32))
    m = WN()
    v = m.init(jax.random.PRNGKey(0), x)
    # non-trivial running stats
    bs = jax.tree.map(
        lambda a: a + jnp.asarray(
            rng.normal(size=a.shape, scale=0.1).astype(np.float32)) ** 2,
        v["batch_stats"])
    ref = m.apply({"params": v["params"], "batch_stats": bs}, x)

    w1, b1, w2, b2, w3, b3 = fold_weightnet(v["params"], bs)
    h = jax.nn.relu(x @ w1 + b1)
    h = jax.nn.relu(h @ w2 + b2)
    out = h @ w3 + b3
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_costvolume_fused_attention_matches_unfused():
    """AttentiveCostVolume banded inference: super-fused == XLA chain.

    Same variables, same banded kNN/grouping — the only difference is the
    attention+weightnet+aggregation implementation, so outputs must agree
    to float tolerance.
    """
    from ssf_slam_tpu.models.costvolume import AttentiveCostVolume

    rng = np.random.default_rng(23)
    B, N, C = 1, 1024, 16
    xyz1 = jnp.asarray(_lidar_cloud(rng, N))[None]
    xyz2 = xyz1 + jnp.asarray(
        rng.normal(size=(B, N, 3), scale=0.05).astype(np.float32))
    f1 = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))
    f2 = jnp.asarray(rng.normal(size=(B, N, C)).astype(np.float32))

    kw = dict(nsample=8, mlp=(32, 32, 32), flow_mlp=(32, 32),
              use_flow=False, backend="banded")
    m_f = AttentiveCostVolume(**kw, fuse_attention=True)
    m_u = AttentiveCostVolume(**kw, fuse_attention=False)
    v = m_f.init(jax.random.PRNGKey(0), xyz1, xyz2, None, f1, f2)
    out_f = m_f.apply(v, xyz1, xyz2, None, f1, f2)
    out_u = m_u.apply(v, xyz1, xyz2, None, f1, f2)
    for a, b, name in zip(out_f, out_u,
                          ("cost_fwd", "cost_bwd", "flow_feats", "re_sf")):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4,
            err_msg=name)


def test_segnet_banded_backend_agrees_with_xla():
    """SegNet on the banded engine: same params, argmax masks must agree
    with the exact-ish XLA path almost everywhere (banded kNN is
    approximate; logits differ only where neighbor sets differ)."""
    from ssf_slam_tpu.models.segnet import SegNet

    rng = np.random.default_rng(31)
    N = 2048
    xyz = jnp.asarray(_lidar_cloud(rng, N))[None]
    flow = jnp.asarray(rng.normal(size=(1, N, 3), scale=0.1).astype(
        np.float32))

    kw = dict(n_classes=2, sa_npoints=(1024, 256), sa_nsample=(8, 8),
              sa_mlps=((16, 16), (32, 32)), head=(32, 32))
    m_x = SegNet(**kw, neighbor_backend="xla")
    m_b = SegNet(**kw, neighbor_backend="banded")
    v = m_x.init(jax.random.PRNGKey(0), xyz, flow)
    lx = m_x.apply(v, xyz, flow)
    lb = m_b.apply(v, xyz, flow)  # same params: sort adds none
    assert lb.shape == lx.shape
    agree = float(
        (np.asarray(lb).argmax(-1) == np.asarray(lx).argmax(-1)).mean())
    assert agree > 0.9, agree


def test_morton_sort_roundtrip():
    rng = np.random.default_rng(5)
    pts = jnp.asarray(rng.uniform(-30, 30, (3, 512, 3)).astype(np.float32))
    srt, perm = nb.morton_sort(pts)
    inv = nb.invert_permutation(perm)
    back = jnp.take_along_axis(srt, inv[..., None], axis=-2)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(pts))


def test_dual_knn_group_matches_separate():
    """banded_knn_group2 == two banded_knn_group calls when both use the
    shared plan; under its OWN plan the second query's recall vs exact kNN
    must stay high (the coarse-flow displacement fits the band slack)."""
    rng = np.random.default_rng(41)
    B, N, K, C = 1, 1024, 8, 6
    q0 = np.stack([_lidar_cloud(rng, N)])  # xyz1
    p_a = np.stack([_lidar_cloud(rng, N)])  # xyz2 (Morton-sorted below)
    feats = rng.normal(size=(B, N, C)).astype(np.float32)

    box = nb.cloud_box(jnp.asarray(q0), jnp.asarray(p_a))
    # queries are Morton-sorted (TFlow's stem invariant); the warped query
    # q_a = xyz1 + coarse flow is only NEAR-sorted, as in the real model
    q_b, _ = nb.morton_sort(jnp.asarray(q0), box=box)
    flow = jnp.asarray(
        rng.normal(scale=0.4, size=(B, N, 3)).astype(np.float32))
    q_a = q_b + flow
    p_a_s, perm = nb.morton_sort(jnp.asarray(p_a), box=box)
    p_b_s = p_a_s + 0.05  # row-aligned warped target
    f_s = jnp.take_along_axis(jnp.asarray(feats), perm[..., None], axis=-2)

    ia, ga, ib, gb, plan, params = nb.nn_knn_group2(
        q_a, q_b, p_a_s, p_b_s, f_s, K, backend="banded", box=box)
    assert params is not None

    # leg A must be IDENTICAL to the single fused kernel under the same plan
    ia1, ga1, _, _ = nb.nn_knn_group(
        q_a, p_a_s, f_s, K, backend="banded", plan=plan, params=params)
    np.testing.assert_array_equal(np.asarray(ia), np.asarray(ia1))
    np.testing.assert_allclose(np.asarray(ga), np.asarray(ga1))

    # leg B under the shared plan: recall vs the exact kNN oracle
    _, i_ex = knn(q_b, p_b_s, K)
    i_b, i_e = np.asarray(ib)[0], np.asarray(i_ex)[0]
    hits = sum(len(set(i_b[i]) & set(i_e[i])) for i in range(0, N, 3))
    recall = hits / (len(range(0, N, 3)) * K)
    assert recall > 0.85, recall
    # grouped rows are exact copies at the returned indices
    np.testing.assert_allclose(
        np.asarray(gb)[0], np.asarray(f_s)[0][i_b], atol=0)

    # feats gradient: sum of both legs' segment-sums
    def loss(ft):
        _, ga2, _, gb2, _, _ = nb.nn_knn_group2(
            q_a, q_b, p_a_s, p_b_s, ft, K, backend="banded", box=box)
        return jnp.sum(ga2 * ga2) + jnp.sum(jnp.abs(gb2))

    g = jax.grad(loss)(f_s)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).sum()) > 0
