"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; sharding correctness is validated on
XLA's host-platform virtual devices. Must set flags before jax imports.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The environment's axon TPU plugin force-appends itself to jax_platforms at
# import time, overriding the env var — override it back after import.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
