"""Faster R-CNN detector assembly (train/test graphs as one Flax module).

The TPU rewrite of the reference's symbolic assembly
(symbol/builder.py:42-95 FasterRcnn.get_train_symbol / get_test_symbol +
models/FPN/builder.py FPN components): backbone -> neck -> rpn head ->
in-graph anchor targets + proposals -> in-graph proposal target sampling ->
multilevel RoIAlign -> bbox head -> losses (train) or decoded detections
(test). Everything is statically shaped and jit-compiled; sampling uses the
'sampling' flax RNG collection.
"""
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from simpledet_tpu.kernels.roi_align import batched_multilevel_roi_align
from simpledet_tpu.models.heads import (Bbox2fcHead, bbox_head_loss,
                                        bbox_head_predict)
from simpledet_tpu.models.rpn import FPNRpnHead
from simpledet_tpu.targets.proposal_target import batched_proposal_target


def deterministic_proposals(gt_bbox, n_prop):
    """[B, G, 5] padded gt (class -1 sentinel) -> [B, n_prop, 4] proposals
    that depend ONLY on gt: each gt box replicated through a fixed jitter
    table spanning high-IoU (fg) to low-IoU (bg) perturbations. Used by the
    fixed_proposals debug hook so both meshes of a DP-parity test sample
    identical rois regardless of conv-output ULPs."""
    g = gt_bbox.shape[1]
    idx = jnp.arange(n_prop) % g
    k = jnp.arange(n_prop) // g
    boxes = gt_bbox[:, idx, :4]                       # [B, n_prop, 4]
    valid = gt_bbox[:, idx, 4] >= 0                   # [B, n_prop]
    boxes = jnp.where(valid[..., None], boxes,
                      jnp.asarray([0.0, 0.0, 32.0, 32.0]))
    # (dx, dy, size-scale): rows 0-3 stay above fg_thr 0.5, the rest drift
    # into bg territory
    jit_tab = jnp.asarray([
        [0.0, 0.0, 1.00], [2.0, -2.0, 1.00], [-3.0, 3.0, 0.92],
        [4.0, 4.0, 1.08], [12.0, -9.0, 1.30], [-18.0, 11.0, 0.65],
        [28.0, 24.0, 1.90], [-30.0, -22.0, 0.45],
    ])
    off = jit_tab[k % jit_tab.shape[0]]               # [n_prop, 3]
    cx = (boxes[..., 0] + boxes[..., 2]) * 0.5 + off[:, 0]
    cy = (boxes[..., 1] + boxes[..., 3]) * 0.5 + off[:, 1]
    w = (boxes[..., 2] - boxes[..., 0] + 1.0) * off[:, 2]
    h = (boxes[..., 3] - boxes[..., 1] + 1.0) * off[:, 2]
    out = jnp.stack([cx - 0.5 * (w - 1.0), cy - 0.5 * (h - 1.0),
                     cx + 0.5 * (w - 1.0), cy + 0.5 * (h - 1.0)], axis=-1)
    return jnp.maximum(out, 0.0)


class RpnOnly(nn.Module):
    """RPN-only detector (reference symbol/builder.py:9-39 RPN): train =
    backbone -> neck -> rpn losses; test = proposals out."""
    backbone: nn.Module
    neck: nn.Module
    rpn_module: nn.Module
    rpn: Any

    @nn.compact
    def __call__(self, data, im_info, gt_bbox=None, mode="train"):
        pad_hw = data.shape[1:3]
        pyr = self.neck(self.backbone(data))
        rpn_out = self.rpn_module(pyr)
        if mode == "train":
            rng_anchor = self.make_rng("sampling")
            losses, aux = self.rpn.loss(rng_anchor, rpn_out, gt_bbox,
                                        im_info, pad_hw)
            return losses, aux
        boxes, scores = self.rpn.proposals(rpn_out, im_info, pad_hw,
                                           is_train=False)
        return {"proposal": boxes, "proposal_score": scores}


class FasterRcnn(nn.Module):
    """Component-composed two-stage detector.

    backbone / neck are bound Flax modules; rpn is an FPNRpnHead wrapper;
    bbox_head is a Flax module; p* are nothrow config params (RpnParam,
    RoiParam, BboxParam).
    """
    backbone: nn.Module
    neck: nn.Module
    rpn_module: nn.Module    # the conv head (params live here)
    rpn: Any                 # FPNRpnHead helper (pure target/proposal fns)
    bbox_head: nn.Module
    p_rpn: Any
    p_roi: Any
    p_bbox: Any
    # Debug hook (reference AnchorTarget2D.DEBUG analog,
    # core/detection_input.py:371,485-494): replace the RPN's proposals
    # with a deterministic function of gt_bbox only. Severs the top-k/NMS
    # tie-break dependence on conv-output ULPs, so DP-parity tests can
    # assert the continuous fwd/bwd path at ~1e-5 instead of the 5e-3 the
    # discrete-roi amplification otherwise forces (tests/test_grad_parity).
    fixed_proposals: bool = False

    def pyramid(self, data):
        feats = self.backbone(data)
        return self.neck(feats)

    def extract_rois(self, pyramid, rois):
        """[B, R, 4] rois -> [B, R, P, P, C] features from P2..P5."""
        strides = tuple(self.p_roi.stride)
        feats = [pyramid.get(f"rcnn_stride{s}", pyramid[f"stride{s}"])
                 for s in strides]  # ReduceNeck publishes rcnn_* keys
        return batched_multilevel_roi_align(
            feats, rois, strides, out_size=self.p_roi.out_size,
            canonical_scale=self.p_roi.roi_canonical_scale or 224,
            canonical_level=self.p_roi.roi_canonical_level or 4)

    @nn.compact
    def __call__(self, data, im_info, gt_bbox=None, mode="train"):
        pad_hw = data.shape[1:3]
        pyr = self.pyramid(data)
        rpn_out = self.rpn_module(pyr)

        if mode == "rpn_test":
            boxes, scores = self.rpn.proposals(rpn_out, im_info, pad_hw,
                                               is_train=False)
            return {"proposal": boxes, "proposal_score": scores}

        if mode == "train":
            rng_anchor = self.make_rng("sampling")
            rng_sample = self.make_rng("sampling")
            rpn_losses, rpn_aux = self.rpn.loss(rng_anchor, rpn_out, gt_bbox,
                                                im_info, pad_hw)
            proposals, _ = self.rpn.proposals(rpn_out, im_info, pad_hw,
                                              is_train=True)
            if self.fixed_proposals:
                proposals = deterministic_proposals(gt_bbox,
                                                    proposals.shape[1])
            ps = self.p_rpn.subsample_proposal
            pt = self.p_rpn.bbox_target
            sample = batched_proposal_target(
                rng_sample, proposals, gt_bbox,
                image_rois=ps.image_roi, fg_fraction=ps.fg_fraction,
                fg_thr=ps.fg_thr, bg_thr_hi=ps.bg_thr_hi,
                bg_thr_lo=ps.bg_thr_lo, num_reg_class=pt.num_reg_class,
                class_agnostic=pt.class_agnostic,
                proposal_wo_gt=ps.proposal_wo_gt or False,
                bbox_mean=pt.mean, bbox_std=pt.std, bbox_weight=pt.weight)
            sample = jax.lax.stop_gradient(sample)

            roi_feat = self.extract_rois(pyr, sample["rois"])
            cls_logit, bbox_delta = self.bbox_head(roi_feat)
            losses = bbox_head_loss(
                cls_logit, bbox_delta, sample["label"],
                sample["bbox_target"], sample["bbox_weight"],
                smooth_l1_scalar=getattr(self.p_bbox.regress_target,
                                         "smooth_l1_scalar", None) or 1.0)
            losses.update(rpn_losses)
            aux = dict(rpn_aux)
            aux["bbox_label"] = sample["label"]
            aux["bbox_cls_logit"] = cls_logit
            return losses, aux

        # test: proposals -> head -> decoded per-class boxes
        proposals, prop_scores = self.rpn.proposals(rpn_out, im_info, pad_hw,
                                                    is_train=False)
        roi_feat = self.extract_rois(pyr, proposals)
        cls_logit, bbox_delta = self.bbox_head(roi_feat)
        rt = self.p_bbox.regress_target
        score, boxes = bbox_head_predict(
            cls_logit, bbox_delta, proposals, im_info,
            bbox_mean=rt.mean, bbox_std=rt.std,
            class_agnostic=rt.class_agnostic or False,
            num_class=self.p_bbox.num_class)
        return {"cls_score": score, "bbox_xyxy": boxes, "rois": proposals,
                "roi_score": prop_scores}
