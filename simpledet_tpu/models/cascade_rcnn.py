"""Cascade R-CNN: 3-stage progressive refinement with per-stage resampling.

TPU rewrite of the reference models/cascade_rcnn/builder.py:
  * train (:14-79): stage1 samples from RPN proposals (fg 0.5); stage k+1
    decodes stage k's class-agnostic deltas into refined proposals
    (get_all_proposal :370-401) and re-runs proposal-target matching at a
    higher IoU (0.6 / 0.7) with tighter target stds
    (0.1 -> 0.05 -> 0.033); per-stage loss weights 1.0 / 0.5 / 0.25.
  * test (:82-135): boxes refined through all 3 stages; classification
    scores averaged over the three heads all evaluated on the STAGE-3 roi
    features ("1st_3rd"/"2nd_3rd" weight reuse :116-127).

All stages keep the static [B, image_roi] shape — refined proposals replace
the box coordinates but never change the roi count, which makes the cascade
trivially jittable.
"""
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from simpledet_tpu.kernels.roi_align import batched_multilevel_roi_align
from simpledet_tpu.models.heads import bbox_head_loss
from simpledet_tpu.ops.bbox import clip_boxes, decode_boxes
from simpledet_tpu.targets.proposal_target import batched_proposal_target


def decode_refined(proposal, bbox_delta, im_info, *, mean, std,
                   class_agnostic=True):
    """Stage-k deltas -> stage-(k+1) proposals. Takes the foreground box of
    the class-agnostic 2-class regression (delta cols 4:8), decodes with the
    stage's (mean, std) and clips (reference get_all_proposal + X.decode_bbox)."""
    boxes = decode_boxes(proposal, bbox_delta, means=mean, stds=std)
    if class_agnostic:
        boxes = boxes[..., 4:8]
    boxes = clip_boxes(boxes, im_info[:, None, :2])
    return jax.lax.stop_gradient(boxes)


class CascadeRcnn(nn.Module):
    backbone: nn.Module
    neck: nn.Module
    rpn_module: nn.Module
    rpn: Any
    head_1st: nn.Module              # 3 stage heads (distinct params)
    head_2nd: nn.Module
    head_3rd: nn.Module
    p_rpn: Any
    p_roi: Any
    p_bboxes: Sequence[Any]          # 3 stage param sets

    @property
    def heads(self):
        return (self.head_1st, self.head_2nd, self.head_3rd)

    def pyramid(self, data):
        return self.neck(self.backbone(data))

    def extract_rois(self, pyramid, rois):
        strides = tuple(self.p_roi.stride)
        feats = [pyramid.get(f"rcnn_stride{s}", pyramid[f"stride{s}"])
                 for s in strides]  # ReduceNeck publishes rcnn_* keys
        return batched_multilevel_roi_align(
            feats, rois, strides, out_size=self.p_roi.out_size,
            canonical_scale=self.p_roi.roi_canonical_scale or 224,
            canonical_level=self.p_roi.roi_canonical_level or 4)

    def _sample(self, rng, proposals, gt_bbox, ps, pt):
        sample = batched_proposal_target(
            rng, proposals, gt_bbox,
            image_rois=ps.image_roi, fg_fraction=ps.fg_fraction,
            fg_thr=ps.fg_thr, bg_thr_hi=ps.bg_thr_hi, bg_thr_lo=ps.bg_thr_lo,
            num_reg_class=pt.num_reg_class, class_agnostic=pt.class_agnostic,
            proposal_wo_gt=ps.proposal_wo_gt or False,
            bbox_mean=pt.mean, bbox_std=pt.std, bbox_weight=pt.weight)
        return jax.lax.stop_gradient(sample)

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
            rpn_losses, rpn_aux = self.rpn.loss(rng_anchor, rpn_out, gt_bbox,
                                                im_info, pad_hw)
            proposals, _ = self.rpn.proposals(rpn_out, im_info, pad_hw,
                                              is_train=True)

            losses = dict(rpn_losses)
            aux = dict(rpn_aux)
            # stage sampling params: stage1 from RpnParam.subsample_proposal,
            # stage k+1 from stage k's BboxParam (reference config layout)
            stage_sample = [
                (self.p_rpn.subsample_proposal, self.p_rpn.bbox_target),
                (self.p_bboxes[0].subsample_proposal,
                 self.p_bboxes[0].bbox_target),
                (self.p_bboxes[1].subsample_proposal,
                 self.p_bboxes[1].bbox_target),
            ]
            cur_proposals = proposals
            for i, (head, p) in enumerate(zip(self.heads, self.p_bboxes)):
                rng_s = self.make_rng("sampling")
                ps, pt = stage_sample[i]
                sample = self._sample(rng_s, cur_proposals, gt_bbox, ps, pt)
                roi_feat = self.extract_rois(pyr, sample["rois"])
                cls_logit, bbox_delta = head(roi_feat)
                stage_losses = bbox_head_loss(
                    cls_logit, bbox_delta, sample["label"],
                    sample["bbox_target"], sample["bbox_weight"])
                w = p.loss_weight if p.loss_weight is not None else 1.0
                s = p.stage or f"stage{i + 1}"
                losses[f"bbox_cls_loss_{s}"] = w * stage_losses["bbox_cls_loss"]
                losses[f"bbox_reg_loss_{s}"] = w * stage_losses["bbox_reg_loss"]
                aux[f"bbox_label_{s}"] = sample["label"]
                aux[f"bbox_cls_logit_{s}"] = cls_logit
                if i == 0:
                    aux["bbox_label"] = sample["label"]
                    aux["bbox_cls_logit"] = cls_logit
                if i + 1 < len(self.heads):
                    rt = p.regress_target
                    cur_proposals = decode_refined(
                        sample["rois"], bbox_delta, im_info,
                        mean=rt.mean, std=rt.std,
                        class_agnostic=rt.class_agnostic
                        if rt.class_agnostic is not None else True)
            return losses, aux

        # test
        proposals, prop_scores = self.rpn.proposals(rpn_out, im_info, pad_hw,
                                                    is_train=False)
        cur = proposals
        deltas, logits, feats = [], [], []
        for i, (head, p) in enumerate(zip(self.heads, self.p_bboxes)):
            roi_feat = self.extract_rois(pyr, cur)
            cls_logit, bbox_delta = head(roi_feat)
            feats.append(roi_feat)
            logits.append(cls_logit)
            deltas.append(bbox_delta)
            rt = p.regress_target
            cur = decode_refined(cur, bbox_delta, im_info,
                                 mean=rt.mean, std=rt.std,
                                 class_agnostic=rt.class_agnostic
                                 if rt.class_agnostic is not None else True)

        # score averaging: all three heads applied to STAGE-3 features
        feat3 = feats[2]
        s1, _ = self.heads[0](feat3)
        s2, _ = self.heads[1](feat3)
        score = (jax.nn.softmax(s1, -1) + jax.nn.softmax(s2, -1)
                 + jax.nn.softmax(logits[2], -1)) / 3.0

        num_class = self.p_bboxes[2].num_class
        boxes = jnp.tile(cur, (1, 1, num_class))
        return {"cls_score": score, "bbox_xyxy": boxes, "rois": proposals,
                "roi_score": prop_scores}
