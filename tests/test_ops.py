"""Unit tests for the kernel substrate vs brute-force NumPy oracles."""

import jax.numpy as jnp
import numpy as np
import pytest

from ssf_slam_tpu.ops import (
    farthest_point_sample,
    gather_points,
    gmm_background_mask,
    group_points,
    kabsch,
    knn,
    knn_interpolate,
    voxel_downsample,
)
from ssf_slam_tpu.ops.knn import nearest_neighbor


@pytest.fixture
def rng():
    return np.random.default_rng(42)


# ---------------------------------------------------------------- kNN

def np_knn(q, p, k):
    d = ((q[:, None] - p[None]) ** 2).sum(-1)
    idx = np.argsort(d, axis=-1, kind="stable")[:, :k]
    return np.take_along_axis(d, idx, -1), idx


def test_knn_exact(rng):
    q = rng.normal(size=(100, 3)).astype(np.float32)
    p = rng.normal(size=(200, 3)).astype(np.float32)
    d, i = knn(jnp.asarray(q), jnp.asarray(p), 5)
    d_ref, i_ref = np_knn(q, p, 5)
    np.testing.assert_allclose(np.asarray(d), d_ref, rtol=1e-3, atol=1e-4)
    # indices can permute under distance ties; compare distances of picks
    picked = ((q[:, None] - p[np.asarray(i)]) ** 2).sum(-1)
    np.testing.assert_allclose(picked, d_ref, rtol=1e-3, atol=1e-4)


def test_knn_chunked_matches_unchunked(rng):
    q = rng.normal(size=(300, 3)).astype(np.float32)
    p = rng.normal(size=(128, 3)).astype(np.float32)
    d1, i1 = knn(jnp.asarray(q), jnp.asarray(p), 4, query_chunk=64)
    d2, i2 = knn(jnp.asarray(q), jnp.asarray(p), 4, query_chunk=4096)
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_knn_respects_points_mask(rng):
    q = rng.normal(size=(50, 3)).astype(np.float32)
    p = rng.normal(size=(60, 3)).astype(np.float32)
    mask = np.zeros(60, dtype=bool)
    mask[:20] = True
    _, i = knn(jnp.asarray(q), jnp.asarray(p), 3, points_mask=jnp.asarray(mask))
    assert np.asarray(i).max() < 20


def test_nearest_neighbor(rng):
    q = rng.normal(size=(40, 3)).astype(np.float32)
    p = rng.normal(size=(70, 3)).astype(np.float32)
    d, i = nearest_neighbor(jnp.asarray(q), jnp.asarray(p))
    d_ref, i_ref = np_knn(q, p, 1)
    np.testing.assert_array_equal(np.asarray(i), i_ref[:, 0])


def test_knn_batched(rng):
    q = rng.normal(size=(2, 30, 3)).astype(np.float32)
    p = rng.normal(size=(2, 50, 3)).astype(np.float32)
    d, i = knn(jnp.asarray(q), jnp.asarray(p), 4)
    for b in range(2):
        _, i_ref = np_knn(q[b], p[b], 4)
        np.testing.assert_array_equal(np.asarray(i[b]), i_ref)


# ---------------------------------------------------------------- FPS

def np_fps(pts, npoint):
    n = pts.shape[0]
    idxs = np.zeros(npoint, dtype=np.int64)
    dist = np.full(n, np.inf)
    last = 0
    for i in range(1, npoint):
        d = ((pts - pts[last]) ** 2).sum(-1)
        dist = np.minimum(dist, d)
        last = int(np.argmax(dist))
        idxs[i] = last
    return idxs


def test_fps_matches_oracle(rng):
    pts = rng.normal(size=(128, 3)).astype(np.float32)
    idx = farthest_point_sample(jnp.asarray(pts), 16, groups=1)
    np.testing.assert_array_equal(np.asarray(idx), np_fps(pts, 16))


def test_fps_bucketed_spreads(rng):
    # bucketed FPS must COVER space comparably to exact FPS: the fill
    # distance (max distance of any point to its nearest sample) stays close
    pts = rng.uniform(-10, 10, size=(1024, 3)).astype(np.float32)

    def fill_dist(idx):
        sel = pts[np.asarray(idx)]
        d = ((pts[:, None] - sel[None]) ** 2).sum(-1)
        return np.sqrt(d.min(axis=1).max())

    exact = farthest_point_sample(jnp.asarray(pts), 256, groups=1)
    bucketed = farthest_point_sample(jnp.asarray(pts), 256, groups=8)
    assert len(set(np.asarray(bucketed).tolist())) == 256
    assert fill_dist(bucketed) < 1.75 * fill_dist(exact)

    # MORTON-SORTED input (the banded neighbor engine's invariant): strided
    # bucket membership must keep buckets spatially uniform — contiguous
    # chunks of a sorted cloud would be spatial regions and the union of
    # per-region FPS would stop spreading
    from ssf_slam_tpu.ops.morton import morton_argsort
    srt = pts[np.asarray(morton_argsort(jnp.asarray(pts), extent=10.0))]

    def fill_dist_s(idx):
        sel = srt[np.asarray(idx)]
        d = ((srt[:, None] - sel[None]) ** 2).sum(-1)
        return np.sqrt(d.min(axis=1).max())

    bucketed_s = farthest_point_sample(jnp.asarray(srt), 256, groups=8)
    assert fill_dist_s(bucketed_s) < 1.75 * fill_dist(exact)


def test_fps_masked(rng):
    pts = rng.normal(size=(64, 3)).astype(np.float32)
    mask = np.zeros(64, dtype=bool)
    mask[10:40] = True
    idx = np.asarray(farthest_point_sample(jnp.asarray(pts), 8, jnp.asarray(mask)))
    assert set(idx).issubset(set(range(10, 40)))
    assert len(set(idx)) == 8  # spread out, no dupes with enough valid points


def test_fps_batched(rng):
    pts = rng.normal(size=(3, 100, 3)).astype(np.float32)
    idx = farthest_point_sample(jnp.asarray(pts), 10)
    assert idx.shape == (3, 10)
    for b in range(3):
        np.testing.assert_array_equal(np.asarray(idx[b]), np_fps(pts[b], 10))


# ---------------------------------------------------------------- grouping

def test_gather_group(rng):
    pts = rng.normal(size=(50, 4)).astype(np.float32)
    idx = rng.integers(0, 50, size=(10,))
    out = gather_points(jnp.asarray(pts), jnp.asarray(idx))
    np.testing.assert_array_equal(np.asarray(out), pts[idx])

    gidx = rng.integers(0, 50, size=(10, 6))
    out = group_points(jnp.asarray(pts), jnp.asarray(gidx))
    np.testing.assert_array_equal(np.asarray(out), pts[gidx])


# ---------------------------------------------------------------- interp

def test_knn_interpolate_exact_at_sources(rng):
    sparse = rng.normal(size=(30, 3)).astype(np.float32)
    feats = rng.normal(size=(30, 5)).astype(np.float32)
    # querying exactly at a source point -> that point's features dominate
    # (the 1 cm gradient-safety floor in idw_weights caps the self-weight,
    # so the match is close but not exact)
    out = knn_interpolate(jnp.asarray(sparse), jnp.asarray(sparse),
                          jnp.asarray(feats), k=3)
    err = np.abs(np.asarray(out) - feats)
    assert err.mean() < 0.05 and err.max() < 0.4


def test_knn_interpolate_convexity(rng):
    sparse = rng.normal(size=(20, 3)).astype(np.float32)
    feats = rng.uniform(0, 1, size=(20, 2)).astype(np.float32)
    dense = rng.normal(size=(40, 3)).astype(np.float32)
    out = np.asarray(knn_interpolate(jnp.asarray(dense), jnp.asarray(sparse),
                                     jnp.asarray(feats), k=4))
    assert out.min() >= feats.min() - 1e-5 and out.max() <= feats.max() + 1e-5


# ---------------------------------------------------------------- voxel

def test_voxel_downsample_centroids(rng):
    # two tight clusters far apart -> exactly 2 representatives at centroids
    a = rng.normal(size=(20, 3)).astype(np.float32) * 0.01 + 0.5
    b = rng.normal(size=(30, 3)).astype(np.float32) * 0.01 + 100.5
    pts = np.concatenate([a, b])
    out, m = voxel_downsample(jnp.asarray(pts), 1.0)
    m = np.asarray(m)
    assert m.sum() == 2
    reps = np.asarray(out)[m]
    got = {tuple(np.round(r, 2)) for r in reps}
    want = {tuple(np.round(a.mean(0), 2)), tuple(np.round(b.mean(0), 2))}
    assert got == want


def test_voxel_downsample_respects_mask(rng):
    pts = rng.uniform(0, 10, size=(100, 3)).astype(np.float32)
    mask = np.zeros(100, dtype=bool)
    mask[:50] = True
    _, m = voxel_downsample(jnp.asarray(pts), 0.5, jnp.asarray(mask))
    assert not np.asarray(m)[50:].any()


# ---------------------------------------------------------------- kabsch

def test_kabsch_recovers_transform(rng):
    from scipy.spatial.transform import Rotation

    src = rng.normal(size=(100, 3)).astype(np.float32)
    r_true = Rotation.random(random_state=1).as_matrix().astype(np.float32)
    t_true = rng.normal(size=3).astype(np.float32)
    dst = src @ r_true.T + t_true
    r, t = kabsch(jnp.asarray(src), jnp.asarray(dst))
    np.testing.assert_allclose(np.asarray(r), r_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-4)


def test_kabsch_masked_ignores_outliers(rng):
    from scipy.spatial.transform import Rotation

    src = rng.normal(size=(80, 3)).astype(np.float32)
    r_true = Rotation.random(random_state=2).as_matrix().astype(np.float32)
    t_true = np.array([1.0, -2.0, 0.5], np.float32)
    dst = src @ r_true.T + t_true
    dst[60:] += rng.normal(size=(20, 3)) * 50  # corrupt 20 correspondences
    w = np.ones(80, np.float32)
    w[60:] = 0.0
    r, t = kabsch(jnp.asarray(src), jnp.asarray(dst), jnp.asarray(w))
    np.testing.assert_allclose(np.asarray(r), r_true, atol=1e-4)
    np.testing.assert_allclose(np.asarray(t), t_true, atol=1e-4)


# ---------------------------------------------------------------- gmm

def test_gmm_separates_moving_points(rng):
    # mimic the noSeg split: background = small flow, movers = large flow
    n_bg, n_fg = 400, 100
    xyz = rng.uniform(-20, 20, size=(n_bg + n_fg, 3)).astype(np.float32)
    flow = np.zeros((n_bg + n_fg, 3), np.float32)
    flow[:n_bg] = rng.normal(scale=0.02, size=(n_bg, 3))  # ego-comp static
    flow[n_bg:] = rng.normal(loc=3.0, scale=0.1, size=(n_fg, 3))  # movers
    feats = np.concatenate([flow, xyz], axis=1)
    bg = np.asarray(gmm_background_mask(jnp.asarray(feats)))
    # majority cluster must be the static points
    assert bg[:n_bg].mean() > 0.95
    assert bg[n_bg:].mean() < 0.05


def test_gmm_masked(rng):
    feats = rng.normal(size=(100, 6)).astype(np.float32)
    mask = np.zeros(100, dtype=bool)
    mask[:70] = True
    bg = np.asarray(gmm_background_mask(jnp.asarray(feats), jnp.asarray(mask)))
    assert not bg[70:].any()


def test_eig3_matches_eigh(rng):
    """Closed-form symmetric 3x3 spectrum (ops/eig3.py) vs jnp.linalg.eigh
    on random covariance-shaped batches, including the degenerate shapes the
    plane fits actually gate on (collinear -> rank 1, isotropic)."""
    from ssf_slam_tpu.ops.eig3 import eigvals_sym3, smallest_eigvec_sym3

    pts = rng.normal(size=(512, 5, 3)).astype(np.float32)
    # mix in anisotropic (plane-like) neighborhoods
    pts[:200, :, 2] *= 0.01  # thin planes
    pts[200:260, :, 1:] *= 0.01  # near-collinear
    pts[260:300] = pts[260:300, :1]  # identical points -> zero cov
    c = pts - pts.mean(axis=1, keepdims=True)
    cov = np.einsum("fkc,fkd->fcd", c, c).astype(np.float32)

    evals, v = smallest_eigvec_sym3(jnp.asarray(cov))
    evals2 = eigvals_sym3(jnp.asarray(cov))
    np.testing.assert_allclose(np.asarray(evals), np.asarray(evals2))
    ref_w, ref_v = np.linalg.eigh(cov)
    scale = np.maximum(np.abs(ref_w).max(axis=-1, keepdims=True), 1e-3)
    np.testing.assert_allclose(
        np.asarray(evals) / scale, ref_w / scale, atol=2e-3)

    # eigenvector check where the smallest eigenvalue is isolated
    gap = (ref_w[:, 1] - ref_w[:, 0]) / scale[:, 0]
    iso = gap > 1e-2
    assert iso.sum() > 300
    dots = np.abs(np.einsum("fc,fc->f", np.asarray(v)[iso], ref_v[iso, :, 0]))
    np.testing.assert_array_less(0.999, dots)
    # unit norm everywhere (degenerate included)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(v), axis=-1), 1.0, atol=1e-5)
