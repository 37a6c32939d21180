from ssf_slam_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    shard_batch,
    make_sharded_train_step,
    run_sequences_batched,
)
