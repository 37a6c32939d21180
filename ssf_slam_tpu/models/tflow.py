"""TFlow: coarse-to-fine Siamese scene-flow network.

TPU-native replacement for ``TFlow`` (TFlowV3_Occlussion.py:65-196): shared
point_conv stem, a 4-level set-abstraction pyramid (8192 -> 2048 -> 512 ->
256 -> 128 points), set-up-conv decoders, and per-level flow refinement via
warping + the bidirectional attentive cost volume, with inverse-distance flow
upsampling between levels. Returns per-level flows (fine first) and the FPS
index chain for multi-scale supervision.

``multi_scale_loss`` replaces multiScaleLoss (TFlowV3_Occlussion.py:199-220).

With ``joint_seg`` (add_Seg_after_FLow, utils/datasets/carla.py:9 +
soflow.py:343-346) every flow tensor carries a 4th channel holding a
static/moving segmentation logit co-estimated with the flow — the full SSF
co-estimation configuration.

The forward is split into ``tower`` (the per-cloud Siamese half: stem + SA
pyramid + per-cloud up-convs) and ``head`` (everything that crosses the two
clouds: cost volumes, warping, upsampling). ``__call__`` composes them —
identical math and identical parameter tree to the round-2 monolith — but
the split lets the SLAM engine CACHE the previous scan's tower in the scan
carry: in a scanned sequence, frame k's cloud-1 is frame k-1's cloud-2, so
recomputing its tower every step (as the reference does per pair,
main_sju_occ_ros.py:213) wastes half the pyramid FLOPs. Tower reuse requires
a sequence-stable Morton ``box`` (see engine/fused.py).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from ssf_slam_tpu.config import FlowNetConfig
from ssf_slam_tpu.models.costvolume import AttentiveCostVolume
from ssf_slam_tpu.models.layers import (
    PointMLP,
    SetAbstraction,
    SetUpConv,
    point_warping,
    upsample_flow,
    upsample_multi,
)
from ssf_slam_tpu.ops.grouping import gather_points
from ssf_slam_tpu.ops.neighbors import cloud_box, invert_permutation, morton_sort

Array = jax.Array


class TFlow(nn.Module):
    """Scene-flow network; forward (pc1, pc2) -> ([flows fine->coarse], fps_inds)."""

    cfg: FlowNetConfig = FlowNetConfig()

    def setup(self):
        cfg = self.cfg
        dtype = jnp.dtype(cfg.dtype)
        out_ch = 4 if cfg.joint_seg else 3
        bn = cfg.use_bn
        backend = cfg.neighbor_backend
        extent = cfg.morton_extent

        # shared stem (TFlowV3_Occlussion.py:68,113-117)
        self.point_conv = PointMLP((32, 32), dtype=dtype)

        # set-abstraction pyramid, weights shared across the two clouds.
        # (Batch-stacking the Siamese halves through one [2B] pyramid was
        # measured SLOWER on-chip — 87.6 vs 92.3 scans/s — the doubled
        # vmapped pallas grids lose more to pipeline startup than the
        # halved launch count saves.)
        def mk_sa(i):
            return SetAbstraction(
                npoint=cfg.sa_npoints[i],
                nsample=cfg.sa_nsample[i],
                mlp=cfg.sa_mlps[i],
                use_bn=bn,
                dtype=dtype,
                backend=backend,
                extent=extent,
            )

        self.sa1, self.sa2, self.sa3, self.sa4 = (mk_sa(i) for i in range(4))

        self.su3 = SetUpConv(min(16, cfg.sa_npoints[3]), (256, 256),
                             (256, 256), use_bn=bn, dtype=dtype,
                             backend=backend, extent=extent)
        self.su2 = SetUpConv(min(16, cfg.sa_npoints[2]), (128, 128),
                             (128, 128), use_bn=bn, dtype=dtype,
                             backend=backend, extent=extent)
        self.su1 = SetUpConv(min(16, cfg.sa_npoints[1]), (64, 64), (64, 64),
                             use_bn=bn, dtype=dtype, backend=backend,
                             extent=extent)
        self.su0 = SetUpConv(min(16, cfg.sa_npoints[0]), (64, 64), (64, 64),
                             use_bn=bn, dtype=dtype, backend=backend,
                             extent=extent)

        def mk_cost(mlp, flow_mlp, use_flow):
            return AttentiveCostVolume(
                cfg.cost_nsample, mlp, flow_mlp, use_flow=use_flow,
                out_channels=out_ch, flow_clamp=cfg.flow_clamp, dtype=dtype,
                backend=backend, extent=extent,
                fuse_attention=cfg.fuse_attention,
            )

        self.flow3_r = mk_cost((256, 256), (128, 128), use_flow=False)
        self.flow2_r = mk_cost((128, 128), (128, 128), use_flow=True)
        self.flow1_r = mk_cost((64, 64), (64, 64), use_flow=True)
        self.flow0_r = mk_cost((64, 64), (64, 64), use_flow=True)

        self.deconv3_2 = PointMLP((64,), dtype=dtype)
        self.deconv2_1 = PointMLP((32,), dtype=dtype)
        self.deconv1_0 = PointMLP((32,), dtype=dtype)

    def tower(self, pc: Array, train: bool = False, box=None) -> dict:
        """Per-cloud Siamese half: Morton sort (banded) + stem + SA pyramid +
        per-cloud up-conv decoders (TFlowV3_Occlussion.py:113-131,155-176 for
        one cloud).

        On the banded backend ``box`` must be the shared Morton box both
        towers of a pair use — the tower is a pure function of (pc, box), so
        a cached tower stays valid across scan steps only under a stable box.
        """
        perm = None
        if self.cfg.neighbor_backend == "banded":
            pc, perm = morton_sort(pc, box=box)

        feats = self.point_conv(pc, train)
        l1_pc, l1_f, l1_idx = self.sa1(pc, feats, train, box=box)
        l2_pc, l2_f, l2_idx = self.sa2(l1_pc, l1_f, train, box=box)
        l3_pc, l3_f, l3_idx = self.sa3(l2_pc, l2_f, train, box=box)
        l4_pc, l4_f, _ = self.sa4(l3_pc, l3_f, train, box=box)

        l3_4_f = self.su3(l3_pc, l4_pc, l3_f, l4_f, train, box=box)
        l2_3_f = self.su2(l2_pc, l3_pc, l2_f, l3_4_f, train, box=box)
        l1_2_f = self.su1(l1_pc, l2_pc, l1_f, l2_3_f, train, box=box)
        l0_f = self.su0(pc, l1_pc, feats, l1_2_f, train, box=box)

        return dict(
            pc=pc, perm=perm,
            l1_pc=l1_pc, l2_pc=l2_pc, l3_pc=l3_pc,
            l3_4_f=l3_4_f, l2_3_f=l2_3_f, l1_2_f=l1_2_f, l0_f=l0_f,
            l1_idx=l1_idx, l2_idx=l2_idx, l3_idx=l3_idx,
        )

    def head(self, t1: dict, t2: dict, train: bool = False,
             box=None) -> tuple[list[Array], list[Array]]:
        """Cross-cloud half: per-level cost volumes + warping + upsampling
        (TFlowV3_Occlussion.py:131-196)."""
        cfg = self.cfg
        backend = cfg.neighbor_backend
        extent = cfg.morton_extent
        uk = cfg.upsample_k
        wn = cfg.warp_nsample
        pc1, pc2 = t1["pc"], t2["pc"]

        # ---- level 3 (coarsest refined level) (:131-135)
        c_fwd_l3, c_bwd_l3, l3_feats, l3_flow = self.flow3_r(
            t1["l3_pc"], t2["l3_pc"], None, t1["l3_4_f"], t2["l3_4_f"],
            train=train, box=box,
        )

        # ---- level 2 (:137-153)
        # c_fwd upsampling rides the same (dense, sparse) neighbor pair as
        # the flow/feature upsample — ONE fused idw kernel for all three
        # fields (k unified on upsample_k; the aggregation weights are
        # shared, which only smooths the cost interpolation)
        l2_coarse, l2_sf_feat, c_fwd_up = upsample_multi(
            t1["l2_pc"], t1["l3_pc"], (l3_flow, l3_feats, c_fwd_l3), k=uk[0],
            clamp=cfg.upsample_clamp, backend=backend, extent=extent,
            box=box)
        c_fwd = jnp.concatenate(
            [t1["l2_3_f"], self.deconv3_2(c_fwd_up, train)],
            axis=-1,
        )
        c_bwd = jnp.concatenate(
            [t2["l2_3_f"],
             self.deconv3_2(upsample_flow(t2["l2_pc"], t2["l3_pc"], c_bwd_l3,
                                          clamp=cfg.upsample_clamp,
                                          backend=backend, extent=extent,
                                          box=box), train)],
            axis=-1,
        )
        pc2w_l2 = point_warping(t1["l2_pc"], t2["l2_pc"], l2_coarse, wn[1],
                                clamp=cfg.warp_clamp,
                                backend=backend, extent=extent, box=box)
        c_fwd_l2, c_bwd_l2, l2_feats, l2_flow = self.flow2_r(
            t1["l2_pc"], t2["l2_pc"], pc2w_l2, c_fwd, c_bwd, l2_coarse,
            l2_sf_feat, train=train, box=box,
        )

        # ---- level 1 (:155-171)
        l1_coarse, l1_sf_feat, c_fwd_up = upsample_multi(
            t1["l1_pc"], t1["l2_pc"], (l2_flow, l2_feats, c_fwd_l2), k=uk[1],
            clamp=cfg.upsample_clamp, backend=backend, extent=extent,
            box=box)
        c_fwd = jnp.concatenate(
            [t1["l1_2_f"], self.deconv2_1(c_fwd_up, train)],
            axis=-1,
        )
        c_bwd = jnp.concatenate(
            [t2["l1_2_f"],
             self.deconv2_1(upsample_flow(t2["l1_pc"], t2["l2_pc"], c_bwd_l2,
                                          clamp=cfg.upsample_clamp,
                                          backend=backend, extent=extent,
                                          box=box), train)],
            axis=-1,
        )
        pc2w_l1 = point_warping(t1["l1_pc"], t2["l1_pc"], l1_coarse, wn[2],
                                clamp=cfg.warp_clamp,
                                backend=backend, extent=extent, box=box)
        c_fwd_l1, c_bwd_l1, l1_feats, l1_flow = self.flow1_r(
            t1["l1_pc"], t2["l1_pc"], pc2w_l1, c_fwd, c_bwd, l1_coarse,
            l1_sf_feat, train=train, box=box,
        )

        # ---- level 0 (full resolution) (:175-187)
        l0_coarse, l0_sf_feat, c_fwd_up = upsample_multi(
            pc1, t1["l1_pc"], (l1_flow, l1_feats, c_fwd_l1), k=uk[2],
            clamp=cfg.upsample_clamp, backend=backend, extent=extent,
            box=box)
        c_fwd = jnp.concatenate(
            [t1["l0_f"], self.deconv1_0(c_fwd_up, train)],
            axis=-1,
        )
        c_bwd = jnp.concatenate(
            [t2["l0_f"],
             self.deconv1_0(upsample_flow(pc2, t2["l1_pc"], c_bwd_l1,
                                          clamp=cfg.upsample_clamp,
                                          backend=backend, extent=extent,
                                          box=box), train)],
            axis=-1,
        )
        pc2w_l0 = point_warping(pc1, pc2, l0_coarse, wn[3],
                                clamp=cfg.warp_clamp,
                                backend=backend, extent=extent, box=box)
        _, _, _, flow = self.flow0_r(
            pc1, pc2, pc2w_l0, c_fwd, c_bwd, l0_coarse, l0_sf_feat,
            train=train, box=box,
        )

        l1_idx = t1["l1_idx"]
        if t1["perm"] is not None:
            # finest flow back to the caller's input point order; coarser
            # levels live at FPS points whose identity rides the composed
            # index chain, so they need no un-sorting
            inv = invert_permutation(t1["perm"])
            flow = jnp.take_along_axis(flow, inv[..., None], axis=-2)
            l1_idx = jnp.take_along_axis(t1["perm"], l1_idx, axis=-1)

        flows = [flow, l1_flow, l2_flow, l3_flow]  # fine -> coarse
        fps_inds = [l1_idx, t1["l2_idx"], t1["l3_idx"]]
        return flows, fps_inds

    def __call__(
        self,
        pc1: Array,  # [B, N, 3]
        pc2: Array,  # [B, N, 3]
        train: bool = False,
        box=None,
    ) -> tuple[list[Array], list[Array]]:
        # Morton-sort both clouds at the stem so every level satisfies the
        # banded neighbor engine's sorted invariant (FPS subsets of a sorted
        # array, taken in ascending index order, stay sorted). The finest
        # flow is un-sorted back to input order in head(); the FPS index
        # chain is composed with the permutation so multi_scale_loss
        # subsamples GT consistently.
        if box is None and self.cfg.neighbor_backend == "banded":
            box = cloud_box(pc1, pc2)  # shared adaptive Morton box
        t1 = self.tower(pc1, train, box)
        t2 = self.tower(pc2, train, box)
        return self.head(t1, t2, train, box)


def multi_scale_loss(
    pred_flows: list[Array],  # fine -> coarse, [B, N_l, 3(+1)]
    gt_flow: Array,  # [B, N, 3]
    mask: Array,  # [B, N] validity / supervision mask
    fps_inds: list[Array],
    alpha: tuple = (0.02, 0.04, 0.08, 0.16),
    seg_labels: Array | None = None,  # [B, N] 0/1 moving labels (joint_seg)
    seg_weight: float = 1.0,
    seg_class_weights: tuple | None = None,  # (w_static, w_moving)
) -> Array:
    """Masked multi-scale L2 flow loss (TFlowV3_Occlussion.py:199-220).

    GT flow and mask are subsampled through the saved FPS index chain. When
    the predictions carry a 4th (segmentation-logit) channel, a BCE term on
    ``seg_labels`` is added per level (the add_Seg variant's loss form,
    TFlowV3_Occlussion_addSeg.py multiScaleLoss). ``seg_class_weights``
    applies inverse-frequency class weights to the BCE — the labelweights
    mechanism of utils/datasets/my_carla.py:379-393 (moving points are a
    small minority of street scans; unweighted BCE underfits them).
    """
    gt_flows = [gt_flow]
    gt_masks = [mask]
    gt_segs = [seg_labels]
    for idx in fps_inds:
        gt_flows.append(gather_points(gt_flows[-1], idx))
        gt_masks.append(
            jnp.take_along_axis(gt_masks[-1], idx, axis=-1)
        )
        if seg_labels is not None:
            gt_segs.append(jnp.take_along_axis(gt_segs[-1], idx, axis=-1))

    total = 0.0
    for i, pred in enumerate(pred_flows):
        diff = (pred[..., :3] - gt_flows[i]) * gt_masks[i][..., None]
        # grad-safe L2: d||x||/dx is NaN at exactly 0, and masked rows are
        # exactly 0 — the eps keeps the gradient finite there
        norm = jnp.sqrt(jnp.sum(diff * diff, axis=-1) + 1e-12)
        level = jnp.sum(norm, axis=-1)  # [B]
        total = total + alpha[i] * jnp.mean(level)
        if seg_labels is not None and pred.shape[-1] == 4:
            logit = pred[..., 3]
            bce = optax_sigmoid_bce(logit, gt_segs[i]) * gt_masks[i]
            if seg_class_weights is not None:
                w0, w1 = seg_class_weights
                y = gt_segs[i]
                bce = bce * (w0 * (1.0 - y) + w1 * y)
            total = total + alpha[i] * seg_weight * jnp.mean(
                jnp.sum(bce, axis=-1)
            )
    return total


def optax_sigmoid_bce(logits: Array, labels: Array) -> Array:
    """Numerically-stable sigmoid BCE (optax.sigmoid_binary_cross_entropy)."""
    return jnp.maximum(logits, 0) - logits * labels + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
