"""Online streaming SLAM runner — the live-10-Hz operating mode.

The reference is a live system: the front-end publishes scans at 10 Hz
(scripts/PointCloudOdometry.py:42 rospy.Rate(10)) and the C++ odometry loop
polls at the same rate (src/lidarOdometry.cpp:177). The batch engine here
(`lax.scan` over a preloaded sequence) is faster but not *online*; this
module is the per-arriving-scan host loop:

- one jitted fused step dispatched per arriving scan (tower-cached, so each
  arrival costs ONE cloud's pyramid + the cross-cloud head — see
  engine/fused.py);
- DOUBLE-BUFFERED dispatch (``pipeline_depth``): step k+1 is enqueued
  before step k's pose is read back, so the device computes while the host
  pays the tunnel round-trip — the per-dispatch overhead documented in
  docs/PERFORMANCE.md pathology #1 is hidden instead of serialized. The
  carry is donated, so state buffers flip in place. Depth 1 reproduces the
  strictly-synchronous round-3 behavior;
- the TUM trajectory is appended incrementally (in arrival order — the
  in-flight queue is FIFO), like the reference's streaming writer
  (src/mapOptmization.cpp:355-374);
- latency accounting per scan: ``latency_ms_*`` is COMPLETION latency
  (scan arrival -> its pose read back on the host), the live-mode number;
  ``hz`` is sustained throughput from the dispatch cadence.

The Morton box cannot be computed from the whole sequence online; it is
anchored at the first scan and padded by ``box_margin`` metres of travel
headroom. Scans that drift outside only degrade banded-kNN recall
gracefully (codes clamp to the box), they never fault — but the runner
watches for it and warns once with the measured overshoot so deployments
size ``box_margin`` to their route instead of discovering silent recall
loss (the box is a per-deployment knob, not a constant).
"""

from __future__ import annotations

import collections
import itertools
import sys
import time
from typing import Iterable, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ssf_slam_tpu.config import PipelineConfig
from ssf_slam_tpu.engine.fused import make_fused_step, sequence_box


def box_overshoot(points: np.ndarray, mask: np.ndarray, box) -> float:
    """Max distance (m) any valid point lies outside the Morton box.

    box = (origin [1, 3], scale [1]) as built by ``sequence_box``; 0.0 when
    everything is inside. Host-side guard for the online engines' anchored
    boxes (points outside clamp to the box edge, degrading banded-kNN
    recall silently otherwise).
    """
    lo = np.asarray(box[0]).reshape(3)
    span = float(np.asarray(box[1]).reshape(())[()])
    p = np.asarray(points, np.float32).reshape(-1, 3)
    m = np.asarray(mask).reshape(-1)
    if not m.any():
        return 0.0
    p = p[m]
    over = np.maximum(lo - p, p - (lo + span))
    return float(max(over.max(), 0.0))


class StreamingRunner:
    """Per-arriving-scan SSF/SF pipeline with incremental TUM output."""

    def __init__(self, model, variables, cfg: PipelineConfig,
                 use_gmm: bool = False, seg_apply=None,
                 box_margin: float = 100.0, tum_path: Optional[str] = None,
                 pipeline_depth: int = 2):
        self.model = model
        self.variables = variables
        self.cfg = cfg
        self.use_gmm = use_gmm
        self.seg_apply = seg_apply
        self.box_margin = box_margin
        self.tum_path = tum_path
        self.pipeline_depth = max(int(pipeline_depth), 1)
        self.latencies_ms: list[float] = []
        self.final_state = None  # SlamState after run() (map export etc.)

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
        # donate the carry: the SLAM state + cached tower flip in place on
        # the device instead of allocating a fresh copy per scan
        step = jax.jit(step, donate_argnums=(0,))

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
        if warmup:
            # throwaway carry: the real one is built after (the warmup
            # step DONATES its carry, which would poison reuse)
            c, o = step(make_carry(prev_pts),
                        to_device(first, prev_pts, prev_mask))
            jax.block_until_ready(o["pose_t"])
            del c, o

        carry = make_carry(prev_pts)
        n_scans = 0
        warned_box = False
        # FIFO of in-flight steps: (arrival_time, scan_time, pose_t, pose_q)
        pending: collections.deque = collections.deque()

        def retire(entry):
            t_arr, t_scan, pose_t, pose_q = entry
            # one batched readback — per-leaf np.asarray costs a full tunnel
            # round trip PER LEAF (same trap mesh.py documents: ~2x here)
            p, q = jax.device_get((pose_t, pose_q))  # q is [w, x, y, z]
            self.latencies_ms.append((time.perf_counter() - t_arr) * 1e3)
            if fh is not None:
                fh.write(f"{t_scan:.6f} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} "
                         f"{q[1]:.6f} {q[2]:.6f} {q[3]:.6f} {q[0]:.6f}\n")
                fh.flush()

        t_start = time.perf_counter()
        dispatch_ms: list[float] = []
        for f in itertools.chain([first], it):
            t0 = time.perf_counter()
            if box is not None and not warned_box:
                over = box_overshoot(f["pos1"][:n], f["mask1"][:n], box)
                if over > 0.0:
                    warned_box = True
                    print(f"WARNING: scan points drifted {over:.1f} m outside "
                          f"the anchored Morton box (box_margin="
                          f"{self.box_margin:.0f} m); banded-kNN recall "
                          "degrades beyond it — raise box_margin to the "
                          "route's expected travel", file=sys.stderr)
            scan = to_device(f, prev_pts, prev_mask)
            carry, outs = step(carry, scan)
            dispatch_ms.append((time.perf_counter() - t0) * 1e3)
            prev_pts, prev_mask = scan["points"], scan["mask"]
            pending.append((t0, float(f["time"]),
                            outs["pose_t"], outs["pose_q"]))
            # pipelined readback: block on the OLDEST in-flight pose only
            # once `pipeline_depth` steps are enqueued — the device runs
            # step k+1 while the host pays step k's readback round-trip
            if len(pending) >= self.pipeline_depth:
                retire(pending.popleft())
            n_scans += 1
        while pending:
            retire(pending.popleft())
        wall = time.perf_counter() - t_start
        if fh is not None:
            fh.close()
        self.final_state = carry[0]

        lat = np.asarray(self.latencies_ms)
        disp = np.asarray(dispatch_ms)
        return dict(
            n_scans=n_scans,
            hz=n_scans / wall,
            # COMPLETION latency: scan arrival -> pose read back. At
            # pipeline_depth > 1 this includes the queue wait (up to
            # depth-1 extra step times); depth 1 = live-latency semantics.
            latency_ms_mean=float(lat.mean()),
            latency_ms_p95=float(np.percentile(lat, 95)),
            # DISPATCH latency: host time to enqueue one step (the cadence
            # floor — what bounds sustained Hz when the device keeps up)
            dispatch_ms_mean=float(disp.mean()),
            dispatch_ms_p95=float(np.percentile(disp, 95)),
            pipeline_depth=self.pipeline_depth,
            n_loops=int(carry[0].map_state.n_loops_total),
        )
