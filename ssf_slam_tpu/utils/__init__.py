from ssf_slam_tpu.utils.cache import enable_compilation_cache  # noqa: F401
