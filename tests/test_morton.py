"""Morton windowed neighbor search: recall quality vs exact kNN."""

import jax.numpy as jnp
import numpy as np
import pytest

from ssf_slam_tpu.data.synthetic import SyntheticWorld, simulate_scan, subsample_scan
from ssf_slam_tpu.ops.knn import knn
from ssf_slam_tpu.ops.morton import knn_windowed, morton_argsort, morton_codes


@pytest.fixture(scope="module")
def lidar_cloud():
    rng = np.random.default_rng(0)
    world = SyntheticWorld.traffic_scene(rng, n_moving=0)
    p, m, o = simulate_scan(world, np.array([0.0, 0, 1.8]), 0.0, 0.0,
                            pts_per_row=1024, noise=0.004, rng=rng)
    pts, mask, _ = subsample_scan(p, m, o, 8192, rng)
    return jnp.asarray(pts), jnp.asarray(mask)


def test_morton_codes_locality():
    # points in the same octant-cell share code prefixes: near points have
    # nearer codes than far points on average
    rng = np.random.default_rng(1)
    base = rng.uniform(-30, 30, (100, 3)).astype(np.float32)
    near = base + 0.05
    far = rng.uniform(-30, 30, (100, 3)).astype(np.float32)
    c0 = np.asarray(morton_codes(jnp.asarray(base))).astype(np.int64)
    cn = np.asarray(morton_codes(jnp.asarray(near))).astype(np.int64)
    cf = np.asarray(morton_codes(jnp.asarray(far))).astype(np.int64)
    assert np.median(np.abs(c0 - cn)) < np.median(np.abs(c0 - cf))


def test_windowed_knn_recall(lidar_cloud):
    pts, mask = lidar_cloud
    order = morton_argsort(pts, mask)
    sorted_pts = pts[order]
    sorted_mask = mask[order]

    k = 16
    d_w, i_w = knn_windowed(sorted_pts, sorted_pts, k, window=128,
                            points_mask=sorted_mask)
    d_e, i_e = knn(sorted_pts, sorted_pts, k, points_mask=sorted_mask)

    m = np.asarray(sorted_mask)
    iw, ie = np.asarray(i_w)[m], np.asarray(i_e)[m]
    recall = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / k for a, b in zip(iw, ie)
    ])
    # nearest-1 recall (the neighbor that matters most)
    first = np.mean(iw[:, 0] == ie[:, 0])
    assert recall > 0.82, f"k={k} recall {recall:.3f}"
    assert first > 0.97, f"first-neighbor recall {first:.3f}"


def test_windowed_knn_masks(lidar_cloud):
    pts, mask = lidar_cloud
    order = morton_argsort(pts, mask)
    half = np.asarray(mask[order]).copy()
    half[4096:] = False
    d, i = knn_windowed(pts[order], pts[order], 8, window=64,
                        points_mask=jnp.asarray(half))
    sel = np.asarray(i)[np.asarray(mask[order]) & (np.arange(8192) < 4096)]
    assert (np.asarray(half)[sel]).all()
