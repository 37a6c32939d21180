"""Scene-flow evaluation metrics.

Replaces the reference's ``error`` function (main_sju_occ_ros.py:112-143):
EPE3D, Acc3D-strict (<0.05 m or <5% rel), Acc3D-relax (<0.1 m or <10% rel),
and outlier ratio (>=0.3 m or >=10% rel), all masked per batch row.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array


def flow_metrics(
    pred: Array, gt: Array, mask: Array | None = None
) -> dict:
    """pred/gt [B, N, 3], mask [B, N] -> dict of scalar metrics."""
    if mask is None:
        mask = jnp.ones(pred.shape[:-1], pred.dtype)
    mask = mask.astype(pred.dtype)
    l2 = jnp.linalg.norm(gt - pred, axis=-1) * mask
    sf_norm = jnp.linalg.norm(gt, axis=-1) * mask
    msum = jnp.maximum(jnp.sum(mask, axis=1), 1e-10)

    epe = jnp.mean(jnp.sum(l2, axis=1) / msum)
    rel = l2 / (sf_norm + 1e-10)

    def ratio(cond):
        return jnp.mean(jnp.sum(cond.astype(pred.dtype) * mask, axis=1) / msum)

    acc_strict = ratio((l2 < 0.05) | (rel < 0.05))
    acc_relax = ratio((l2 < 0.1) | (rel < 0.1))
    outlier = ratio((l2 >= 0.3) | (rel >= 0.1))
    return dict(
        epe3d=epe, acc3d_strict=acc_strict, acc3d_relax=acc_relax,
        outlier=outlier,
    )
