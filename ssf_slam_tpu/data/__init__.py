from ssf_slam_tpu.data.synthetic import (  # noqa: F401
    SyntheticWorld,
    simulate_scan,
    generate_sequence,
)
from ssf_slam_tpu.data.carla import (  # noqa: F401
    CarlaSceneFlowDataset,
    load_npz_frame,
    pad_points,
)
