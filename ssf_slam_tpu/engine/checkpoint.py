"""SLAM runtime checkpoint / resume.

The reference never checkpoints SLAM state — a crashed node restarts blank
under roslaunch respawn (launch/run_Seg.launch:8-12) and the trajectory file
is simply appended (src/mapOptmization.cpp:355-374). Here the whole carry
(``SlamState``: odometry pose, velocity, local map, keyframe buffers, loop
factors) is one pytree, so elastic recovery is an orbax save/restore plus
deterministic replay from the saved scan index.
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np

from ssf_slam_tpu.engine.pipeline import SlamState, init_slam_state


def save_slam_state(path: str, state: SlamState, scan_index: int) -> None:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    payload = dict(
        state=jax.tree.map(np.asarray, state),
        scan_index=np.asarray(scan_index, np.int64),
    )
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()


def load_slam_state(path: str, cfg) -> tuple[SlamState, int]:
    """Restore (state, next scan index); cfg rebuilds the target structure."""
    import orbax.checkpoint as ocp

    template = init_slam_state(cfg)
    target = dict(
        state=jax.tree.map(np.asarray, template),
        scan_index=np.asarray(0, np.int64),
    )
    ckptr = ocp.StandardCheckpointer()
    restored = ckptr.restore(path, target)
    return restored["state"], int(restored["scan_index"])
