"""Sharding tests on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest


def test_eight_virtual_devices():
    assert len(jax.devices()) == 8


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 1 and out.shape[-1] in (3, 4)
    assert np.isfinite(np.asarray(out)).all()


def test_sequences_batched():
    from ssf_slam_tpu.config import (
        FeatureConfig,
        MappingConfig,
        PipelineConfig,
        Variant,
    )
    from ssf_slam_tpu.data.synthetic import generate_sequence
    from ssf_slam_tpu.parallel.mesh import make_mesh, run_sequences_batched

    cfg = PipelineConfig(
        variant=Variant.SEG,
        features=FeatureConfig(max_features=512),
        mapping=MappingConfig(max_keyframes=16, submap_points=512,
                              icp_iters=4, loop_submap_halfwidth=2),
    )

    def traj(k):
        return np.array([1.0 * k, 0.0, 1.8]), 0.0

    seqs = [
        generate_sequence(n_frames=4, n_points=2048, seed=s, trajectory=traj)
        for s in (0, 1)
    ]
    # pad points arrays to the engine's max_points
    mesh = make_mesh(2)
    n = cfg.lidar.max_points
    for seq in seqs:
        for f in seq:
            for key in ("pos1", "pos2", "gt", "ego_flow"):
                pad = np.zeros((n, 3), np.float32)
                pad[: len(f[key])] = f[key]
                f[key] = pad
            for key in ("s_fg_mask", "t_fg_mask", "mask1", "mask2"):
                pad = np.zeros(n, f[key].dtype)
                pad[: len(f[key])] = f[key]
                f[key] = pad
    states, outs = run_sequences_batched(seqs, cfg, mesh)
    assert outs["pose_t"].shape == (2, 4, 3)
    assert np.isfinite(np.asarray(outs["pose_t"])).all()
