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


def seg_metrics(
    logits: Array,  # [B, N] moving-class logits (joint_seg 4th channel)
    labels: Array,  # [B, N] 0/1 moving labels
    mask: Array | None = None,  # [B, N] validity
) -> dict:
    """Segmentation quality for the joint flow+seg head.

    The reference's P6 logs per-class segmentation accuracy for its
    PointNet2 classifier (main_sju_occ_addSeg_Pointnet2_ros.py eval block);
    here: overall accuracy, per-class IoU (static / moving), and mean IoU,
    masked. Counts pool over the whole batch (moving points are rare; a
    per-row mean would be dominated by empty rows).
    """
    if mask is None:
        mask = jnp.ones(logits.shape, logits.dtype)
    m = mask.astype(jnp.float32)
    pred = (logits > 0.0).astype(jnp.float32)
    y = labels.astype(jnp.float32)

    acc = jnp.sum((pred == y).astype(jnp.float32) * m) / jnp.maximum(
        jnp.sum(m), 1.0)

    def iou(p, t):
        inter = jnp.sum(p * t * m)
        union = jnp.sum(jnp.maximum(p, t) * m)
        return inter / jnp.maximum(union, 1.0)

    iou_moving = iou(pred, y)
    iou_static = iou(1.0 - pred, 1.0 - y)
    return dict(
        seg_acc=acc,
        iou_static=iou_static,
        iou_moving=iou_moving,
        miou=0.5 * (iou_static + iou_moving),
    )
