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


def test_sequences_sharded_fullsize_ssf():
    """PRODUCTION-SCALE sharded multi-sequence run: one full-size fused SSF
    step per device (8192 pts, loop closure compiled in), via shard_map —
    the B=1-per-device design where lax.cond stays a real branch (vmap
    select-lowering of the loop-ICP branch faulted the device at this
    scale, docs/PERFORMANCE.md)."""
    import dataclasses

    from ssf_slam_tpu.config import (
        FlowNetConfig,
        MappingConfig,
        PipelineConfig,
        Variant,
    )
    from ssf_slam_tpu.data.synthetic import generate_sequence
    from ssf_slam_tpu.models import TFlow
    from ssf_slam_tpu.parallel.mesh import make_mesh, run_sequences_sharded

    n_pts = 8192
    cfg = PipelineConfig(
        variant=Variant.SSF,
        # production step shape; keyframe buffer capped for test memory
        mapping=MappingConfig(max_keyframes=64, submap_points=4096),
    )
    net_cfg = FlowNetConfig(
        npoint=n_pts,
        sa_npoints=(512, 128, 64, 32),  # reduced pyramid: CPU compile time
        sa_nsample=(8, 8, 8, 8),
        cost_nsample=8,
        joint_seg=True,
    )
    model = TFlow(cfg=net_cfg)
    rng = jax.random.PRNGKey(0)
    pc = jax.numpy.zeros((1, n_pts, 3))
    variables = jax.jit(model.init)(rng, pc, pc)

    seqs = [
        generate_sequence(n_frames=2, n_points=n_pts, seed=s, noise=0.004,
                          n_moving=2)
        for s in (0, 1)
    ]
    mesh = make_mesh(2)
    states, outs = run_sequences_sharded(seqs, cfg, mesh, model=model,
                                         variables=variables)
    assert outs["pose_t"].shape == (2, 2, 3)
    assert np.isfinite(np.asarray(outs["pose_t"])).all()
    # both sequences produced distinct trajectories (really ran per-device)
    assert not np.allclose(np.asarray(outs["pose_t"][0]),
                           np.asarray(outs["pose_t"][1]))


import pytest


@pytest.mark.parametrize("backend,n_dev", [("xla", 8), ("banded", 8),
                                           ("banded", 1)])
def test_pointsharded_knn_group_recall(backend, n_dev):
    """Point-axis sharding (SURVEY §2.5 stretch): Morton-contiguous shards +
    ppermute halo exchange. Recall vs the exact single-device oracle must be
    high on lidar-like clouds PER DEVICE (the round-5 chip smoke found edge
    devices' bands displaced by the wrapped-halo masking — aggregate recall
    hid it), and grouped features must match exactly on agreeing indices.
    backend="banded" swaps the per-device search for the single-chip Pallas
    engine (interpret mode here) so a real-slice run is a config change, not
    new code; n_dev=1 is the worst case for the edge masking (both flanks
    wrap)."""
    import contextlib

    import numpy as np
    from jax.experimental.pallas import tpu as pltpu

    from ssf_slam_tpu.parallel.mesh import make_mesh
    from ssf_slam_tpu.parallel.pointshard import (
        pointshard_reference,
        pointsharded_knn_group,
    )

    rng = np.random.default_rng(2)
    n, m, k, c = 2048, 2048, 8, 4
    r = rng.uniform(3, 28, m)
    th = rng.uniform(0, 2 * np.pi, m)
    z = rng.normal(0, 1.5, m)
    pts = np.stack([r * np.cos(th), r * np.sin(th), z], 1).astype(np.float32)
    q = pts[rng.permutation(m)[:n]] + rng.normal(0, 0.05, (n, 3)).astype(
        np.float32)
    feats = rng.normal(size=(m, c)).astype(np.float32)

    mesh = make_mesh(n_dev)
    ctx = (pltpu.force_tpu_interpret_mode() if backend == "banded"
           else contextlib.nullcontext())
    with ctx:
        d_s, i_s, g_s = pointsharded_knn_group(
            jax.numpy.asarray(q), jax.numpy.asarray(pts),
            jax.numpy.asarray(feats), k, mesh, halo=192, backend=backend)
    d_r, i_r, g_r = pointshard_reference(
        jax.numpy.asarray(q), jax.numpy.asarray(pts),
        jax.numpy.asarray(feats), k)

    i_s, i_r = np.asarray(i_s), np.asarray(i_r)
    hits = sum(len(set(i_s[i]) & set(i_r[i])) for i in range(0, n, 4))
    recall = hits / (len(range(0, n, 4)) * k)
    assert recall > 0.9, recall

    # per-device recall: device d owns Morton query rows [d*s, (d+1)*s)
    from ssf_slam_tpu.ops.neighbors import cloud_box as _cb, morton_sort

    _, q_perm = morton_sort(jax.numpy.asarray(q),
                            box=_cb(jax.numpy.asarray(q),
                                    jax.numpy.asarray(pts)))
    q_perm = np.asarray(q_perm)
    s = n // n_dev
    for d in range(n_dev):
        rows = q_perm[d * s:(d + 1) * s:4]
        h = sum(len(set(i_s[i]) & set(i_r[i])) for i in rows)
        r_d = h / (len(rows) * k)
        assert r_d > 0.85, f"device {d} recall {r_d:.3f}"

    # grouped rows are exact copies of the target features: gather via the
    # returned global indices against the Morton-sorted feature array
    g_s = np.asarray(g_s)
    from ssf_slam_tpu.ops.neighbors import cloud_box, morton_sort

    box = cloud_box(jax.numpy.asarray(q), jax.numpy.asarray(pts))
    _, t_perm = morton_sort(jax.numpy.asarray(pts), box=box)
    f_sorted = feats[np.asarray(t_perm)]
    np.testing.assert_allclose(g_s, f_sorted[i_s], atol=0)


def test_sequences_sharded_streaming_matches_batch(tmp_path):
    """Online striped-feed engine == batch shard_map engine: same scans,
    same poses. The native SsfbStripe feeds one sequence per device; the
    carry (SLAM state + cached tower) persists on-device across
    host-dispatched steps."""
    import dataclasses

    from ssf_slam_tpu.config import FlowNetConfig, MappingConfig, \
        PipelineConfig, Variant
    from ssf_slam_tpu.data.ssfb import SsfbStripe, native_available, \
        write_ssfb
    from ssf_slam_tpu.data.synthetic import generate_sequence
    from ssf_slam_tpu.models import TFlow
    from ssf_slam_tpu.parallel.mesh import (
        make_mesh,
        run_sequences_sharded,
        run_sequences_sharded_streaming,
    )

    if not native_available():
        import pytest

        pytest.skip("native toolchain unavailable")

    n_pts = 512
    cfg = PipelineConfig(
        variant=Variant.SSF,
        lidar=dataclasses.replace(PipelineConfig().lidar, max_points=n_pts),
        mapping=MappingConfig(max_keyframes=16, submap_points=512,
                              icp_iters=4, loop_submap_halfwidth=2),
    )
    net_cfg = FlowNetConfig(
        npoint=n_pts, sa_npoints=(128, 32, 16, 8), sa_nsample=(8, 8, 8, 8),
        cost_nsample=8, joint_seg=True,
    )
    model = TFlow(cfg=net_cfg)
    pc = jax.numpy.zeros((1, n_pts, 3))
    variables = jax.jit(model.init)(jax.random.PRNGKey(0), pc, pc)

    seqs, paths = [], []
    for s in (0, 1):
        frames = generate_sequence(n_frames=3, n_points=n_pts, seed=s,
                                   n_moving=1)
        p = str(tmp_path / f"s{s}.ssfb")
        write_ssfb(frames, p)
        seqs.append(frames)
        paths.append(p)

    mesh = make_mesh(2)
    _, outs_batch = run_sequences_sharded(seqs, cfg, mesh, model=model,
                                          variables=variables)

    stripe = SsfbStripe(paths)
    _, outs_stream, stats = run_sequences_sharded_streaming(
        stripe.batches(), cfg, mesh, model, variables)
    stripe.close()

    assert stats["n_scans"] == 3 and stats["n_seqs"] == 2
    assert stats["latency_ms_mean"] > 0
    assert outs_stream["pose_t"].shape == (2, 3, 3)
    # same scans through the same step: same trajectories up to fp
    # reassociation (one big lax.scan jit vs per-step dispatch compiles
    # different fusions; measured max delta ~2e-5 m)
    np.testing.assert_allclose(outs_stream["pose_t"],
                               np.asarray(outs_batch["pose_t"]),
                               rtol=1e-3, atol=1e-3)
