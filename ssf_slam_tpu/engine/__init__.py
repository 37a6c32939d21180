from ssf_slam_tpu.engine.pipeline import (  # noqa: F401
    SlamState,
    init_slam_state,
    slam_step,
    run_sequence,
)
from ssf_slam_tpu.engine.evaluation import (  # noqa: F401
    write_tum,
    read_tum,
    ate_rmse,
    rpe,
    rpe_rmse,
    umeyama_align,
)
