"""Fused network-in-the-loop SLAM step.

The production SSF configuration: TFlow inference runs INSIDE the jitted
per-scan step — scene flow + segmentation logits feed the ego-motion SVD and
the mapping back-end with no host round-trip. This is the single-executable
equivalent of the reference's two-process GPU->CPU->TCPROS hop
(main_sju_occ_addSeg_Pointnet2_ros.py publishing to lidarOdometry).

The step consumes (prev_scan, curr_scan) pairs so the estimated motion is
timestamped at the current frame (see engine/pipeline.py::_frame_motion).

Tower caching: in a scanned sequence, frame k's cloud-1 IS frame k-1's
cloud-2, so the per-cloud Siamese half (TFlow.tower — stem + SA pyramid +
up-convs) of the previous scan rides the carry instead of being recomputed.
The reference recomputes both towers for every pair (main_sju_occ_ros.py:213)
even though consecutive pairs share a cloud; caching halves the pyramid
FLOPs per scan at identical numerics. The one requirement: the Morton box
must be SEQUENCE-stable (a tower sorted under one box is invalid under
another), so the fused paths use a box covering the whole sequence instead
of the per-pair adaptive box.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssf_slam_tpu.config import PipelineConfig, Variant
from ssf_slam_tpu.engine.pipeline import SlamState, init_slam_state, slam_step
from ssf_slam_tpu.models.tflow import TFlow

Array = jax.Array


def sequence_box(all_points: np.ndarray, margin: float = 1.0):
    """Morton box covering a whole sequence: all_points [..., 3] (any
    leading dims). Returns (origin [1, 3], scale [1]) shaped for the
    [B=1, N, 3] tower inputs."""
    flat = np.asarray(all_points, np.float32).reshape(-1, 3)
    lo = flat.min(axis=0) - margin
    span = float((flat.max(axis=0) - lo).max()) + margin
    return (jnp.asarray(lo[None, :]), jnp.asarray([span], jnp.float32))


def make_fused_step(model: TFlow, variables, cfg: PipelineConfig,
                    use_gmm: bool = False, box=None, seg_apply=None):
    """Build the fused step with tower caching.

    Returns ``(fused_step, run_cfg, make_carry)``:
    - ``fused_step(carry, scan) -> (carry, outputs)`` with
      ``carry = (SlamState, tower_prev)``;
    - ``make_carry(first_prev [N, 3]) -> carry`` computes the initial tower
      (frame 0's "previous" cloud — by convention the first scan itself,
      giving a self-pair with ~zero flow, matching the reference's skipped
      frame 0).

    scan: {points [N,3], prev [N,3], mask [N], prev_mask [N], time}.
    ``use_gmm`` selects the SF behavior (GMM split on predicted flow)
    instead of the SSF joint-seg head. ``box`` is the sequence-stable Morton
    box (see ``sequence_box``); required when the model's neighbor backend
    is "banded" (asserted), unused otherwise.

    ``seg_apply``: optional classifier ``(pc [1,N,3], flow [1,N,3]) ->
    logits [1,N,2]`` — the SSF static mask then comes from the SEPARATE
    PointNet2-style classifier fed [xyz || flow], argmaxed (class 0 =
    static), instead of the joint 4-channel head. This is the reference's
    flagship run_Pointnet2Seg configuration
    (main_sju_occ_addSeg_Pointnet2_ros.py:360-378,
    launch/run_Pointnet2Seg_ActiveSceneFlow.launch:15-17), fused into the
    same jitted step.
    """
    variant = Variant.SF if use_gmm else Variant.SSF
    run_cfg = cfg.replace(variant=variant)
    if model.cfg.neighbor_backend == "banded":
        assert box is not None, (
            "tower caching on the banded backend needs a sequence-stable "
            "Morton box (engine.fused.sequence_box)")

    def tower(pc):
        return model.apply(variables, pc, False, box, method=TFlow.tower)

    def fused_step(carry, scan: dict):
        state, t_prev = carry
        t_curr = tower(scan["points"][None])
        flows, _ = model.apply(variables, t_prev, t_curr, False, box,
                               method=TFlow.head)
        out = flows[0][0]
        flow = out[:, :3].astype(jnp.float32)
        slam_scan = dict(
            points=scan["points"],
            mask=scan["mask"],
            time=scan["time"],
            flow_points=scan["prev"],
            flow_mask=scan["prev_mask"],
            flow=flow,
        )
        if variant == Variant.SSF:
            if seg_apply is not None:
                logits = seg_apply(scan["prev"][None], flow[None])[0]
                slam_scan["static_mask"] = jnp.argmax(logits, axis=-1) == 0
            else:
                slam_scan["static_mask"] = out[:, 3] < 0.0
        state, outputs = slam_step(state, slam_scan, run_cfg)
        return (state, t_curr), outputs

    def make_carry(first_prev: Array):
        return (init_slam_state(run_cfg), tower(first_prev[None]))

    return fused_step, run_cfg, make_carry


def stack_fused_scans(frames: list, n: int) -> dict:
    """Host-side: frame dicts -> the fused step's stacked scan arrays."""
    return dict(
        points=jnp.asarray(
            np.stack([f["pos1"][:n] for f in frames]).astype(np.float32)),
        prev=jnp.asarray(np.stack(
            [frames[max(k - 1, 0)]["pos1"][:n] for k in range(len(frames))]
        ).astype(np.float32)),
        mask=jnp.asarray(
            np.stack([f["mask1"][:n].astype(bool) for f in frames])),
        prev_mask=jnp.asarray(np.stack(
            [frames[max(k - 1, 0)]["mask1"][:n].astype(bool)
             for k in range(len(frames))])),
        time=jnp.asarray([f["time"] for f in frames], jnp.float32),
    )


def run_sequence_fused(model, variables, frames: list, cfg: PipelineConfig,
                       use_gmm: bool = False, seg_apply=None):
    """Host wrapper: frames -> fused lax.scan -> trajectory outputs."""
    n = cfg.lidar.max_points
    scans = stack_fused_scans(frames, n)
    box = None
    if model.cfg.neighbor_backend == "banded":
        box = sequence_box(np.asarray(scans["points"]))
    fused_step, run_cfg, make_carry = make_fused_step(
        model, variables, cfg, use_gmm, box=box, seg_apply=seg_apply)

    @jax.jit
    def run(scans):
        carry = make_carry(scans["prev"][0])
        return jax.lax.scan(fused_step, carry, scans)

    (state, _), outs = run(scans)
    return state, {k: np.asarray(v) for k, v in outs.items()}
