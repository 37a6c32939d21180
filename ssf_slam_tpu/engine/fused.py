"""Fused network-in-the-loop SLAM step.

The production SSF configuration: TFlow inference runs INSIDE the jitted
per-scan step — scene flow + segmentation logits feed the ego-motion SVD and
the mapping back-end with no host round-trip. This is the single-executable
equivalent of the reference's two-process GPU->CPU->TCPROS hop
(main_sju_occ_addSeg_Pointnet2_ros.py publishing to lidarOdometry).

The step consumes (prev_scan, curr_scan) pairs so the estimated motion is
timestamped at the current frame (see engine/pipeline.py::_frame_motion).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssf_slam_tpu.config import PipelineConfig, Variant
from ssf_slam_tpu.engine.pipeline import SlamState, init_slam_state, slam_step

Array = jax.Array


def make_fused_step(model, variables, cfg: PipelineConfig,
                    use_gmm: bool = False):
    """Build step(state, scan) with TFlow fused in.

    scan: {points [N,3], prev [N,3], mask [N], prev_mask [N], time}.
    use_gmm selects the SF behavior (GMM split on predicted flow) instead of
    the SSF joint-seg head.
    """
    variant = Variant.SF if use_gmm else Variant.SSF
    run_cfg = cfg.replace(variant=variant)

    def fused_step(state: SlamState, scan: dict):
        flows, _ = model.apply(variables, scan["prev"][None],
                               scan["points"][None])
        out = flows[0][0]
        slam_scan = dict(
            points=scan["points"],
            mask=scan["mask"],
            time=scan["time"],
            flow_points=scan["prev"],
            flow_mask=scan["prev_mask"],
            flow=out[:, :3].astype(jnp.float32),
        )
        if variant == Variant.SSF:
            slam_scan["static_mask"] = out[:, 3] < 0.0
        return slam_step(state, slam_scan, run_cfg)

    return fused_step, run_cfg


def run_sequence_fused(model, variables, frames: list, cfg: PipelineConfig,
                       use_gmm: bool = False):
    """Host wrapper: frames -> fused lax.scan -> trajectory outputs."""
    fused_step, run_cfg = make_fused_step(model, variables, cfg, use_gmm)
    n = cfg.lidar.max_points
    scans = dict(
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

    @jax.jit
    def run(state, scans):
        return jax.lax.scan(fused_step, state, scans)

    state, outs = run(init_slam_state(run_cfg), scans)
    return state, {k: np.asarray(v) for k, v in outs.items()}
