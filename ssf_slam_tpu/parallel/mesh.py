"""Mesh + sharding helpers: the framework's scale-out story.

The reference's only parallelism is single-process ``nn.DataParallel``
(main_sju_occ_ros.py:681-685, NCCL underneath) plus the ROS process pipeline.
Here scale-out is native JAX sharding over a device mesh:

- training: batch-axis data parallelism — parameters replicated, batches
  sharded on axis "data"; XLA inserts the gradient psum over ICI. This is
  the pjit/GSPMD equivalent of DataParallel, minus the parameter broadcast
  per step.
- inference/SLAM: sequences are embarrassingly parallel — ``vmap`` of the
  fused slam step across a sharded sequence axis runs 64 CARLA sequences per
  slice (the BASELINE.json north-star config) with zero cross-chip traffic
  inside the step.

Also provides the multi-chip dryrun used by __graft_entry__.py, validated on
a virtual CPU mesh in tests.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ssf_slam_tpu.config import PipelineConfig, TrainConfig


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def shard_batch(batch: dict, mesh: Mesh, axis: str = "data") -> dict:
    """Place a host batch with leading batch dim sharded across the mesh."""
    sharding = NamedSharding(mesh, P(axis))
    return {k: jax.device_put(jnp.asarray(v), sharding) for k, v in batch.items()}


def make_sharded_train_step(model, tx, mesh: Mesh, cfg: TrainConfig,
                            loss_cfg=None, axis: str = "data"):
    """Data-parallel train step: params replicated, batch sharded.

    jit + NamedSharding constraints let GSPMD partition the step; gradient
    all-reduce rides ICI automatically.
    """
    from ssf_slam_tpu.config import LossConfig
    from ssf_slam_tpu.train.trainer import TrainState, exp_decay_lr
    from ssf_slam_tpu.models.tflow import multi_scale_loss
    import optax

    loss_cfg = loss_cfg or LossConfig()
    replicated = NamedSharding(mesh, P())
    data_sharded = NamedSharding(mesh, P(axis))

    def step_fn(state: TrainState, batch: dict):
        def loss_fn(params):
            (flows, fps), updates = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["pos1"], batch["pos2"], train=True,
                mutable=["batch_stats"],
            )
            seg = batch.get("s_fg_mask") if model.cfg.joint_seg else None
            loss = multi_scale_loss(
                flows, batch["gt"], batch["mask1"].astype(jnp.float32), fps,
                alpha=loss_cfg.alpha, seg_labels=seg,
                seg_weight=loss_cfg.seg_weight,
                seg_class_weights=loss_cfg.seg_class_weights,
            )
            return loss, updates["batch_stats"]

        (loss, bs), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return (
            TrainState(params, bs, opt_state, state.step + 1),
            dict(loss=loss, lr=exp_decay_lr(state.step, cfg, cfg.batch_size)),
        )

    batch_spec = {
        k: data_sharded
        for k in ("pos1", "pos2", "gt", "ego_flow", "s_fg_mask", "t_fg_mask",
                  "mask1", "mask2")
    }
    return jax.jit(
        step_fn,
        in_shardings=(replicated, batch_spec),
        donate_argnums=(0,),
    )


def run_sequences_batched(frames_batch: list, cfg: PipelineConfig,
                          mesh: Optional[Mesh] = None):
    """Run the SLAM engine over B sequences at once (vmap), optionally
    sharded across the mesh's data axis.

    frames_batch: list of sequences (each a list of frame dicts of equal
    length). Returns stacked outputs [B, S, ...].
    """
    from ssf_slam_tpu.engine.pipeline import (
        init_slam_state,
        slam_step,
        stack_scans,
    )

    stacked = [stack_scans(seq, cfg) for seq in frames_batch]
    scans = {
        k: jnp.stack([s[k] for s in stacked]) for k in stacked[0]
    }  # [B, S, ...]
    if mesh is not None:
        sharding = NamedSharding(mesh, P("data"))
        scans = {k: jax.device_put(v, sharding) for k, v in scans.items()}

    def one_sequence(seq_scans):
        state = init_slam_state(cfg)

        def body(carry, scan):
            return slam_step(carry, scan, cfg)

        # scan over the frame axis (axis 0 after vmap peels the batch axis)
        return jax.lax.scan(body, state, seq_scans)

    states, outs = jax.jit(jax.vmap(one_sequence))(scans)
    return states, outs


def run_sequences_sharded(frames_batch: list, cfg: PipelineConfig,
                          mesh: Mesh, model=None, variables=None,
                          use_gmm: bool = False):
    """PRODUCTION multi-sequence engine: one sequence per device via
    shard_map (B = mesh size, batch axis sharded 1-per-device).

    Unlike ``run_sequences_batched`` (vmap), lax.cond inside the step stays
    a REAL branch on each device — the loop-closure ICP executes only on
    loop events instead of being select-lowered into every frame, which at
    full scale faulted the device under vmap (docs/PERFORMANCE.md). This is
    the north-star 64-sequences-per-slice configuration.

    With ``model``/``variables`` given, runs the fused network-in-the-loop
    SSF/SF step (engine/fused.py); otherwise the GT-flow/geometry variants.
    """
    from jax import shard_map

    from ssf_slam_tpu.engine.pipeline import (
        init_slam_state,
        slam_step,
        stack_scans,
    )

    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    assert len(frames_batch) == n_dev, (
        f"need exactly one sequence per device ({n_dev}), "
        f"got {len(frames_batch)}")

    make_carry = None
    if model is not None:
        from ssf_slam_tpu.engine.fused import (
            make_fused_step,
            sequence_box,
            stack_fused_scans,
        )

        n = cfg.lidar.max_points
        stacked = [{k: np.asarray(v) for k, v in
                    stack_fused_scans(seq, n).items()}
                   for seq in frames_batch]
        box = None
        if model.cfg.neighbor_backend == "banded":
            # one box covering ALL sequences: under shard_map the box is a
            # replicated closure constant, so it must be valid on every
            # device (per-sequence boxes would need to ride the sharded
            # scans; a shared box only costs a little Morton resolution)
            box = sequence_box(
                np.concatenate([s["points"].reshape(-1, 3)
                                for s in stacked]))
        step_fn, run_cfg, make_carry = make_fused_step(
            model, variables, cfg, use_gmm, box=box)
    else:
        run_cfg = cfg
        step_fn = lambda st, sc: slam_step(st, sc, cfg)  # noqa: E731
        stacked = [stack_scans(seq, cfg) for seq in frames_batch]

    scans = {k: jnp.stack([s[k] for s in stacked]) for k in stacked[0]}
    sharding = NamedSharding(mesh, P(mesh.axis_names[0]))
    scans = {k: jax.device_put(v, sharding) for k, v in scans.items()}

    spec = P(mesh.axis_names[0])

    @jax.jit
    def run(scans):
        def per_device(local):  # leading batch dim == 1 on each device
            seq = jax.tree.map(lambda x: x[0], local)
            if make_carry is not None:
                carry0 = make_carry(seq["prev"][0])
                (state, _), outs = jax.lax.scan(step_fn, carry0, seq)
            else:
                state, outs = jax.lax.scan(step_fn, init_slam_state(run_cfg),
                                           seq)
            return jax.tree.map(lambda x: x[None], (state, outs))

        return shard_map(
            per_device, mesh=mesh, in_specs=(spec,), out_specs=spec,
            check_vma=False,
        )(scans)

    states, outs = run(scans)
    return states, outs


def run_sequences_sharded_streaming(
    batches,
    cfg: PipelineConfig,
    mesh: Mesh,
    model,
    variables,
    use_gmm: bool = False,
    box_margin: float = 100.0,
    pipeline_depth: int = 1,
):
    """ONLINE multi-sequence engine: one shard_map'd fused step per arriving
    frame-block, one sequence per device.

    ``batches`` is an iterator of ``(frame_idx, {pos1 [S,N,3], mask1 [S,N],
    time [S,N]})`` blocks — in production the native striped reader
    (data/ssfb.py::SsfbStripe.batches(), one mmap'd stream per device with
    its own prefetch thread and a single GIL-released gather per step).
    This is the live counterpart of ``run_sequences_sharded``: the batch
    engine lax.scans preloaded sequences; here the carry (SLAM state +
    cached tower, both device-sharded) persists across host-dispatched
    steps while scans stream in — the reference's one-ROS-process-per-
    sequence deployment collapsed onto one host thread and S devices.

    ``pipeline_depth`` in-flight steps are kept enqueued before the oldest
    step's outputs are read back (same double-buffering as
    engine/streaming.py): the devices compute block k+1 while the host pays
    block k's readback round-trip. Depth 1 = strictly synchronous — and it
    is the MEASURED default for THIS engine (21.9 Hz/seq vs 12.7 at depth 2,
    scripts/bench_streaming.py round 5): unlike StreamingRunner, which reads
    back only the pose pair and gains from depth 2, this engine reads back
    the full per-scan outs dict, and stacking those large readbacks behind
    extra in-flight dispatches serializes on the tunnel instead of hiding
    latency (docs/PERFORMANCE.md pathology #1 discussion).

    The Morton box is anchored at the first block plus ``box_margin`` m of
    travel headroom (same online-box contract as engine/streaming.py); the
    feed warns once if a block's points drift outside it (banded-kNN recall
    degrades silently past the edge — size box_margin to the route).
    Returns (final sharded carry, outs stacked [S, T, ...], stats dict with
    per-step completion latency + sustained per-sequence rate).
    """
    import collections
    import sys
    import time

    from jax import shard_map

    from ssf_slam_tpu.engine.fused import make_fused_step, sequence_box
    from ssf_slam_tpu.engine.streaming import box_overshoot

    n_dev = int(np.prod([mesh.shape[a] for a in mesh.axis_names]))
    spec = P(mesh.axis_names[0])
    sharding = NamedSharding(mesh, spec)

    it = iter(batches)
    try:
        _, first = next(it)
    except StopIteration:
        raise ValueError("empty stream")
    assert first["pos1"].shape[0] == n_dev, (
        f"stripe width {first['pos1'].shape[0]} != mesh devices {n_dev}")

    box = None
    if model.cfg.neighbor_backend == "banded":
        pts = np.asarray(first["pos1"]).reshape(-1, 3)
        box = sequence_box(np.concatenate([pts - box_margin,
                                           pts + box_margin]))
    step_fn, run_cfg, make_carry = make_fused_step(model, variables, cfg,
                                                   use_gmm, box=box)

    def _shmap(f, n_in, n_out):
        return shard_map(f, mesh=mesh, in_specs=(spec,) * n_in,
                         out_specs=(spec,) * n_out if n_out > 1 else spec,
                         check_vma=False)

    @jax.jit
    def init(prev_block):
        def per_device(p):
            return jax.tree.map(lambda x: x[None], make_carry(p[0]))

        return _shmap(per_device, 1, 1)(prev_block)

    def step_per_device(c, s):
        c = jax.tree.map(lambda x: x[0], c)
        s = jax.tree.map(lambda x: x[0], s)
        c2, outs = step_fn(c, s)
        return (jax.tree.map(lambda x: x[None], c2),
                jax.tree.map(lambda x: x[None], outs))

    # donate the carry (SLAM state + cached towers flip in place on-device)
    step = jax.jit(_shmap(step_per_device, 2, 2), donate_argnums=(0,))

    def put(x):
        return jax.device_put(jnp.asarray(x), sharding)

    prev_pts = put(first["pos1"])
    prev_mask = put(first["mask1"] > 0.5)
    carry = init(prev_pts)

    depth = max(int(pipeline_depth), 1)
    outs_seq = []
    latencies = []  # completion latency: block arrival -> outputs on host
    dispatch_ts = []
    pending = collections.deque()  # FIFO of (t_arrival, device outs)

    def retire():
        t_arr, outs = pending.popleft()
        # one batched readback (device_get issues every copy async, then
        # blocks once) — per-leaf np.asarray costs a full tunnel round trip
        # PER LEAF (measured 310 ms/step vs ~60 with the batched get)
        outs_seq.append(jax.device_get(outs))
        latencies.append((time.perf_counter() - t_arr) * 1e3)

    warned_box = False
    block = (0, first)
    while True:
        t0 = time.perf_counter()
        dispatch_ts.append(t0)
        _, b = block
        if box is not None and not warned_box:
            over = box_overshoot(b["pos1"], b["mask1"] > 0.5, box)
            if over > 0.0:
                warned_box = True
                print(f"WARNING: stream points drifted {over:.1f} m outside "
                      f"the anchored Morton box (box_margin={box_margin:.0f} "
                      "m); banded-kNN recall degrades beyond it — raise "
                      "box_margin to the route's expected travel",
                      file=sys.stderr)
        pts = put(b["pos1"])
        mask = put(b["mask1"] > 0.5)
        scan = dict(points=pts, mask=mask,
                    time=put(b["time"][:, 0].astype(np.float32)),
                    prev=prev_pts, prev_mask=prev_mask)
        carry, outs = step(carry, scan)
        pending.append((t0, outs))
        # pipelined readback: only block on the oldest in-flight step once
        # `depth` are enqueued — devices run block k+1 while the host pays
        # block k's readback round-trip
        if len(pending) >= depth:
            retire()
        prev_pts, prev_mask = pts, mask
        try:
            block = next(it)
        except StopIteration:
            break
    while pending:
        retire()

    stacked = {
        k: np.stack([o[k] for o in outs_seq], axis=1)
        for k in outs_seq[0]
    }
    lat = np.asarray(latencies[1:] or latencies)  # step 0 pays compile
    # sustained rate from the dispatch cadence (steady state: skip the
    # compile-billed first gap); completion latency reported separately
    gaps = np.diff(np.asarray(dispatch_ts)) * 1e3
    gaps = gaps[1:] if len(gaps) > 1 else gaps
    step_ms = float(gaps.mean()) if len(gaps) else float(lat.mean())
    stats = dict(n_scans=len(outs_seq), n_seqs=n_dev,
                 latency_ms_mean=float(lat.mean()),
                 latency_ms_p95=float(np.percentile(lat, 95)),
                 step_ms_mean=step_ms,
                 hz_per_seq=float(1e3 / max(step_ms, 1e-9)))
    return carry, stacked, stats
