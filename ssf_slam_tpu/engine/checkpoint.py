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
    """Restore (state, next scan index); cfg rebuilds the target structure.

    Legacy migration: checkpoints written before ``MapState`` gained new
    counters/buffers (round 4: ``n_loops_total``; round 5: ``kf_rnorm`` /
    ``kf_rvalid``) restore against a template stripped to the fields
    the payload actually has; missing fields are backfilled
    (``n_loops_total = n_loops``; normals zero/invalid — the scan-to-map
    refine then treats those keyframes' submap contribution as plane-less,
    which only costs refinement coverage, never correctness).
    """
    import collections

    import orbax.checkpoint as ocp

    template = init_slam_state(cfg)
    ckptr = ocp.StandardCheckpointer()

    def attempt(map_state_tpl):
        target = dict(
            state=jax.tree.map(
                np.asarray, template._replace(map_state=map_state_tpl)
            ),
            scan_index=np.asarray(0, np.int64),
        )
        return ckptr.restore(path, target)

    try:
        restored = attempt(template.map_state)
        return restored["state"], int(restored["scan_index"])
    except (ValueError, KeyError):
        pass
    # legacy payload: probe progressively older MapState layouts
    full = template.map_state._asdict()
    layouts = [
        ("kf_rnorm", "kf_rvalid"),  # pre-round-5
        ("kf_rnorm", "kf_rvalid", "n_loops_total"),  # pre-round-4
    ]
    last_exc = None
    for drop in layouts:
        kept = {k: v for k, v in full.items() if k not in drop}
        legacy_cls = collections.namedtuple("MapState", list(kept))
        try:
            restored = attempt(legacy_cls(**kept))
        except (ValueError, KeyError) as exc:
            last_exc = exc
            continue
        st = restored["state"]
        ms = dict(st.map_state._asdict())
        for k in drop:
            ms[k] = np.asarray(full[k])
        if "n_loops_total" in drop:
            ms["n_loops_total"] = np.asarray(ms["n_loops"])
        from ssf_slam_tpu.mapping.keyframes import MapState

        state = st._replace(map_state=MapState(**ms))
        return state, int(restored["scan_index"])
    raise last_exc
