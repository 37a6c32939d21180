"""Persistent XLA compilation cache.

The fused SLAM step + TFlow graph is large; cold compiles run minutes on the
tunneled TPU. Caching compiled executables on disk makes every process after
the first start in seconds — call this at entry of any binary that jits the
big graphs (bench.py, __graft_entry__.py, the CLI).
"""

from __future__ import annotations

import os

import jax

_DEFAULT = os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> None:
    path = os.path.abspath(path or os.environ.get("SSF_JAX_CACHE", _DEFAULT))
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
