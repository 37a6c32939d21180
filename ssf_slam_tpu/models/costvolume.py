"""Bidirectional attentive cost volume — the heart of TFlow.

TPU-native replacement for ``PointConvTransFlowV2``
(utils/soflow.py:281-525): point-to-patch correlation of (possibly
flow-warped) pc1 neighborhoods in pc2, cross-attention between the straight
and warped neighbor sets, a learned softmax aggregation for the forward cost,
and a scatter-softmax aggregation pushing the backward cost onto pc2 — the
torch_scatter ``scatter_softmax``/``scatter_sum`` pair (soflow.py:474-481)
becomes ``jax.ops.segment_max/segment_sum`` under vmap.

Everything runs channels-last; the QK^T attention and all MLPs are Dense/
einsum ops on the MXU.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ssf_slam_tpu.models.layers import LEAKY_RATE, PointMLP
from ssf_slam_tpu.ops.attention import (
    attention_xla,
    cost_attention_fused,
    fold_weightnet,
)
from ssf_slam_tpu.ops.neighbors import (
    nn_knn_group,
    nn_regroup,
    nn_scatter_softmax_sum,
)

Array = jax.Array


def _segment_softmax_sum(
    values: Array, weights: Array, ids: Array, num_segments: int
) -> Array:
    """Per-segment softmax(weights) applied to values, summed per segment.

    values [M, C], weights [M, 1], ids [M] -> [num_segments, C].
    Replaces scatter_softmax + scatter_sum (soflow.py:474-481).
    """
    w = weights[..., 0]
    # softmax is shift-invariant per segment, so a GLOBAL max stabilizes it
    # just as well as segment_max — and saves one full scatter pass (the
    # weightnet outputs span a few units, far from f32 exp underflow)
    ex = jnp.exp(w - jax.lax.stop_gradient(jnp.max(w)))
    denom = jax.ops.segment_sum(ex, ids, num_segments=num_segments)
    soft = ex / jnp.maximum(denom[ids], 1e-16)
    return jax.ops.segment_sum(values * soft[:, None], ids,
                               num_segments=num_segments)


class AttentiveCostVolume(nn.Module):
    """PointConvTransFlowV2 (soflow.py:281-525), channels-last.

    Args mirror the reference constructor: nsample (K), mlp widths (shared by
    the four MLP stacks), flow_mlp widths, use_flow (warp queries by the
    coarse flow), out_channels of the flow head (3, or 4 for joint flow+seg
    co-estimation — add_Seg_after_FLow, soflow.py:343-346).
    """

    nsample: int
    mlp: Sequence[int]
    flow_mlp: Sequence[int]
    use_flow: bool = True
    out_channels: int = 3
    flow_clamp: float = 50.0
    dtype: jnp.dtype = jnp.float32
    backend: str = "xla"
    extent: float = 64.0
    fuse_attention: bool = True  # super-fused inference chain (banded only)

    @nn.compact
    def __call__(
        self,
        xyz1: Array,  # [B, N1, 3]
        xyz2: Array,  # [B, N2, 3]
        xyz2w: Array | None,  # [B, N2, 3] warped pc2 (None -> xyz2)
        points1: Array,  # [B, N1, D]
        points2: Array,  # [B, N2, D]
        sf: Array | None = None,  # [B, N1, 3|4] coarse flow
        sf_feat: Array | None = None,  # [B, N1, Dsf]
        train: bool = False,
        box=None,
    ) -> tuple[Array, Array, Array, Array]:
        b, n1 = xyz1.shape[0], xyz1.shape[1]
        n2 = xyz2.shape[1]
        k = self.nsample
        if xyz2w is None:
            xyz2w = xyz2

        # --- point-to-patch neighborhoods (soflow.py:384-418)
        query = xyz1 + sf[..., :3] if (sf is not None and self.use_flow) else xyz1
        xyz2_and_feats = jnp.concatenate(
            [xyz2, points2.astype(xyz2.dtype)], -1
        )  # fused gathers: positions + features share the index sets

        # NOTE: a DUAL fused kernel for the twin searches exists
        # (ops/banded.py::banded_knn_group2, nn_knn_group2) — it streams the
        # shared feature payload once, but MEASURED NEGATIVE end-to-end:
        # 108.8±2.5 -> 105.0/105.0/102.1 scans/s. The extra per-tile VMEM
        # residency (two query tiles, nine band blocks, six outputs) costs
        # more pipeline overlap than the saved feats fetch buys. Kept with
        # equivalence/VJP tests as an A/B-able building block.
        knn_idx, grouped, plan_a, params_a = nn_knn_group(
            query, xyz2, xyz2_and_feats, k,
            backend=self.backend, extent=self.extent, box=box)
        direction_xyz = grouped[..., :3] - xyz1[..., None, :]
        # per-point parts (points1, sf_feat) ride PointMLP's distributed
        # first layer: no [N, K, C] tiles are materialized for them
        q_feat = PointMLP(self.mlp, dtype=self.dtype, name="mlp_q")(
            [points1, grouped[..., 3:].astype(points2.dtype)], train)

        # NOTE: the reference gathers xyz2 (not xyz2w) here (soflow.py:407);
        # xyz2w is row-aligned with xyz2, so the fused gather stays valid
        knn_idxw, groupedw, plan_b, params_b = nn_knn_group(
            xyz1, xyz2w, xyz2_and_feats, k,
            backend=self.backend, extent=self.extent, box=box)
        direction_xyzw = groupedw[..., :3] - xyz1[..., None, :]
        k_feat = PointMLP(self.mlp, dtype=self.dtype, name="mlp_k")(
            [points1, groupedw[..., 3:].astype(points2.dtype)], train)

        # --- cross attention between straight and warped patches
        # (:420-422,453-461): fused dual-softmax attention kernel on the
        # banded fast path (ops/attention.py), XLA einsums otherwise

        # --- per-patch cost features through the SHARED cost MLP (:439-451)
        def cost_input(*feats, direction):
            parts = list(feats)
            if sf_feat is not None:
                parts.append(sf_feat)  # per-point; broadcasts in the MLP
            parts.append(direction)
            return parts

        cost_mlp = PointMLP(self.mlp, dtype=self.dtype, name="mlp_cost")
        q_cost = cost_mlp(cost_input(q_feat, direction=direction_xyz), train)
        k_cost = cost_mlp(cost_input(k_feat, direction=direction_xyzw), train)

        # --- attention -> weightnet -> forward aggregation (:453-486).
        # ``fuse_attention`` runs the whole chain as ONE pallas kernel
        # (ops/attention.py::cost_attention_fused): attended [N, K, C]
        # tensors, [N, K, K] dual-softmax products, and logits stay
        # VMEM-resident; inference BatchNorms fold into the Dense weights.
        # MEASURED NEGATIVE end-to-end (config.py note: 109.6 -> 101.4
        # scans/s despite winning isolation 1.35 vs 1.84 ms) — default off.
        # Second data point after the attention-only kernel (91 -> 85):
        # on this chain XLA's producer fusion + kernel overlap beats VMEM
        # residency even with the enclosing boundary pushed out.
        c = self.mlp[-1]
        # The weightnet layers carry EXPLICIT names (fixed to what Flax
        # auto-numbering historically produced, so committed checkpoints
        # keep loading): the fused branch below fetches the same variables
        # by these names via get_variable, and explicit names make that
        # lookup immune to auto-number shifts from any module added earlier
        # in __call__. Constructed once, outside the branch.
        weightnet = nn.Sequential(
            [
                nn.Dense(c, use_bias=False, dtype=self.dtype,
                         name="Dense_0"),
                nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-3, dtype=self.dtype,
                             name="BatchNorm_0"),
                nn.relu,
                nn.Dense(c // 2, use_bias=False, dtype=self.dtype,
                         name="Dense_1"),
                nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-3, dtype=self.dtype,
                             name="BatchNorm_1"),
                nn.relu,
                nn.Dense(1, dtype=self.dtype, name="Dense_2"),
            ],
            name="weightnet",
        )
        use_fused = (
            self.fuse_attention and self.backend == "banded" and not train
            and not self.is_initializing()
            and params_a is not None and n1 % 256 == 0
        )
        if use_fused:
            wn = fold_weightnet(
                {name: self.get_variable("params", name)
                 for name in ("Dense_0", "BatchNorm_0", "Dense_1",
                              "BatchNorm_1", "Dense_2")},
                {name: self.get_variable("batch_stats", name)
                 for name in ("BatchNorm_0", "BatchNorm_1")},
            )
            cost_fwd, w_k_logits = cost_attention_fused(
                q_feat, k_feat, q_cost, wn)
        else:
            q_att, k_att = attention_xla(q_feat, k_feat)
            w_q = weightnet(q_att)  # [B, N1, K, 1]
            w_k_logits = weightnet(k_att)[..., 0]

            # --- forward cost: learned softmax over the patch (:469,486)
            weights1 = jax.nn.softmax(w_q, axis=-2)
            cost_fwd = jnp.sum(weights1 * q_cost, axis=-2)  # [B, N1, C]

        # --- backward cost: scatter-softmax onto pc2 (:471-484)
        cost_bwd = nn_scatter_softmax_sum(
            k_cost, w_k_logits, knn_idxw, n2, plan_b, params_b
        ).astype(k_cost.dtype)  # [B, N2, C]

        # --- patch-to-patch grouping + MLP + max (:489-509)
        grouped_bwd = nn_regroup(cost_bwd, knn_idx, plan_a, params_a)
        # cost_fwd is constant across the patch (the reference tiles it,
        # soflow.py:489-493) — as a per-point part it skips the tile
        g_in = cost_input(cost_fwd, grouped_bwd, direction=direction_xyz)
        g = PointMLP(self.mlp, dtype=self.dtype, name="mlp_patch")(g_in, train)
        patch_cost = jnp.max(g, axis=-2)  # [B, N1, C]

        # --- flow head (:511-521)
        flow_feats = PointMLP(self.flow_mlp, dtype=self.dtype,
                              name="mlp_flow")(patch_cost, train)
        re_sf = nn.Dense(self.out_channels, dtype=self.dtype, name="fc")(
            flow_feats
        )
        re_sf = jnp.clip(re_sf, -self.flow_clamp, self.flow_clamp)
        if sf is not None:
            re_sf = jnp.clip(re_sf + sf, -self.flow_clamp, self.flow_clamp)
        return cost_fwd, cost_bwd, flow_feats, re_sf
