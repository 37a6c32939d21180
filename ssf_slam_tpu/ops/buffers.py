"""Cursor-addressed buffer writes.

``buf.at[idx].set(value)`` with a traced index lowers to dynamic_update_slice,
which the TPU backend compiler handles pathologically for large operands
(measured: a single such write into a [512, 4096, 3] keyframe buffer pushed
an otherwise-instant program's compile past 6 minutes on TPU v5e, vs 0.7 s on
CPU). A one-hot select compiles instantly and costs one full-buffer
read/write per step — ~25 MB at HBM bandwidth, tens of microseconds.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def row_write(buf: Array, idx: Array, value: Array) -> Array:
    """buf [K, ...] with buf[idx] <- value, via one-hot select."""
    iota = jnp.arange(buf.shape[0])
    sel = (iota == idx).reshape((-1,) + (1,) * (buf.ndim - 1))
    return jnp.where(sel, value[None] if value.ndim == buf.ndim - 1 else value,
                     buf)
