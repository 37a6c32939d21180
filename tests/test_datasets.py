"""Benchmark dataset reader tests (synthetic files in each layout)."""

import numpy as np
import pytest

from ssf_slam_tpu.data.generic import (
    Flownet3dDataset,
    HplflownetDataset,
    make_dataset,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def test_hplflownet_layout(tmp_path, rng):
    for i in range(3):
        d = tmp_path / f"{i:07d}"
        d.mkdir()
        pc1 = rng.normal(size=(3000, 3)).astype(np.float32)
        np.save(d / "pc1.npy", pc1)
        np.save(d / "pc2.npy", pc1 + 0.1)
    ds = HplflownetDataset(str(tmp_path), n_points=1024)
    assert len(ds) == 3
    item = ds[0]
    assert item["pos1"].shape == (1024, 3)
    np.testing.assert_allclose(item["gt"], 0.1, atol=1e-6)


def test_flownet3d_layout_both_dialects(tmp_path, rng):
    pc1 = rng.normal(size=(2000, 3)).astype(np.float32)
    flow = rng.normal(size=(2000, 3)).astype(np.float32) * 0.2
    np.savez(tmp_path / "a.npz", points1=pc1, points2=pc1 + flow, flow=flow,
             valid_mask1=np.ones(2000, bool))
    np.savez(tmp_path / "b.npz", pos1=pc1, pos2=pc1 + flow, gt=flow,
             s_fg_mask=np.zeros(2000, np.float32))
    ds = Flownet3dDataset(str(tmp_path), n_points=512)
    assert len(ds) == 2
    for i in range(2):
        item = ds[i]
        assert item["pos1"].shape == (512, 3)
        assert np.isfinite(item["gt"]).all()


def test_factory(tmp_path, rng):
    pc1 = rng.normal(size=(100, 3)).astype(np.float32)
    np.savez(tmp_path / "x.npz", pos1=pc1, pos2=pc1, gt=np.zeros_like(pc1))
    ds = make_dataset("kitti_fn3d", str(tmp_path), n_points=64)
    assert len(ds) == 1
