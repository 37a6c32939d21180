from ssf_slam_tpu.train.trainer import (  # noqa: F401
    TrainState,
    create_train_state,
    train_step,
    eval_step,
    train_scene_flow,
    exp_decay_lr,
)
