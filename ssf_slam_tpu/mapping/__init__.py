from ssf_slam_tpu.mapping.posegraph import solve_pose_graph  # noqa: F401
from ssf_slam_tpu.mapping.keyframes import (  # noqa: F401
    MapState,
    init_map_state,
    mapping_step,
)
