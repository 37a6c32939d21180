"""Online streaming SLAM runner — the live-10-Hz operating mode.

The reference is a live system: the front-end publishes scans at 10 Hz
(scripts/PointCloudOdometry.py:42 rospy.Rate(10)) and the C++ odometry loop
polls at the same rate (src/lidarOdometry.cpp:177). The batch engine here
(`lax.scan` over a preloaded sequence) is faster but not *online*; this
module is the per-arriving-scan host loop:

- one jitted fused step dispatched per arriving scan (tower-cached, so each
  arrival costs ONE cloud's pyramid + the cross-cloud head — see
  engine/fused.py);
- the TUM trajectory is appended incrementally, like the reference's
  streaming writer (src/mapOptmization.cpp:355-374);
- true end-to-end latency accounting per scan (host prep + H2D + step +
  pose readback), the number that must stay under 100 ms for 10 Hz.

The Morton box cannot be computed from the whole sequence online; it is
anchored at the first scan and padded by ``box_margin`` metres of travel
headroom. Scans that drift outside only degrade banded-kNN recall
gracefully (codes clamp to the box), they never fault.
"""

from __future__ import annotations

import itertools
import time
from typing import Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssf_slam_tpu.config import PipelineConfig
from ssf_slam_tpu.engine.fused import make_fused_step, sequence_box


class StreamingRunner:
    """Per-arriving-scan SSF/SF pipeline with incremental TUM output."""

    def __init__(self, model, variables, cfg: PipelineConfig,
                 use_gmm: bool = False, seg_apply=None,
                 box_margin: float = 100.0, tum_path: Optional[str] = None):
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.use_gmm = use_gmm
        self.seg_apply = seg_apply
        self.box_margin = box_margin
        self.tum_path = tum_path
        self.latencies_ms: list[float] = []

    def run(self, frames: Iterable[dict], warmup: bool = True) -> dict:
        """Consume an iterator of frame dicts ({pos1, mask1, time}); returns
        summary stats. Poses stream to ``tum_path`` as they are computed.

        ``warmup`` runs one throwaway step on the first scan so jit compile
        time (minutes cold, seconds warm-cache) is not billed to scan 0's
        latency — a live deployment compiles before the sensor starts.
        """
        n = self.cfg.lidar.max_points
        it: Iterator[dict] = iter(frames)
        first = next(it)

        box = None
        if self.model.cfg.neighbor_backend == "banded":
            pts = np.asarray(first["pos1"][:n], np.float32)
            box = sequence_box(
                np.concatenate([pts - self.box_margin,
                                pts + self.box_margin]))
        step, run_cfg, make_carry = make_fused_step(
            self.model, self.variables, self.cfg, self.use_gmm, box=box,
            seg_apply=self.seg_apply)
        step = jax.jit(step)

        def to_device(f, prev_pts, prev_mask):
            return dict(
                points=jnp.asarray(f["pos1"][:n], jnp.float32),
                prev=prev_pts,
                mask=jnp.asarray(f["mask1"][:n], bool),
                prev_mask=prev_mask,
                time=jnp.float32(f["time"]),
            )

        fh = open(self.tum_path, "w") if self.tum_path else None

        prev_pts = jnp.asarray(first["pos1"][:n], jnp.float32)
        prev_mask = jnp.asarray(first["mask1"][:n], bool)
        carry0 = make_carry(prev_pts)
        if warmup:
            c, o = step(carry0, to_device(first, prev_pts, prev_mask))
            jax.block_until_ready(o["pose_t"])
            del c, o

        carry = carry0
        n_scans = 0
        t_start = time.perf_counter()
        for f in itertools.chain([first], it):
            t0 = time.perf_counter()
            scan = to_device(f, prev_pts, prev_mask)
            carry, outs = step(carry, scan)
            prev_pts, prev_mask = scan["points"], scan["mask"]
            # live semantics: the pose of THIS scan is read back before the
            # next arrival — the blocking readback IS the end-to-end latency
            p = np.asarray(outs["pose_t"])
            q = np.asarray(outs["pose_q"])  # [w, x, y, z]
            self.latencies_ms.append((time.perf_counter() - t0) * 1e3)
            if fh is not None:
                t = float(f["time"])
                fh.write(f"{t:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                         f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}\n")
                fh.flush()
            n_scans += 1
        wall = time.perf_counter() - t_start
        if fh is not None:
            fh.close()

        lat = np.asarray(self.latencies_ms)
        return dict(
            n_scans=n_scans,
            hz=n_scans / wall,
            latency_ms_mean=float(lat.mean()),
            latency_ms_p95=float(np.percentile(lat, 95)),
            n_loops=int(carry[0].map_state.n_loops),
        )
