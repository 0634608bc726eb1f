"""Mask R-CNN: Faster R-CNN + fg-first mask branch with in-graph targets.

TPU rewrite of the reference models/maskrcnn/builder.py:
  * MaskFasterRcnn (:14-64): two-stage detector + mask branch; train samples
    proposals fg-first so the mask branch sees exactly the first
    image_roi*fg_fraction rows (:205-220); test runs in-graph per-class NMS
    (BboxPostProcessor, bbox_post_processing.py:35-110) and the mask head on
    the post-NMS top-k boxes.
  * MaskFasterRcnn4ConvHead (:316-366): 4x 3x3 conv (dim_reduced, MSRA-out
    init) -> 2x deconv -> relu -> 1x1 num_class logit; loss gathers the fg
    class channel and applies mean-reduced sigmoid CE
    (SigmoidCrossEntropy, :296-312).

Mask targets come from the on-device polygon rasterizer
(targets/mask_target.py) replacing the C++ ProposalMaskTarget
(operator_cxx/proposal_mask_target.cc).
"""
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from simpledet_tpu.kernels.roi_align import batched_multilevel_roi_align
from simpledet_tpu.models.faster_rcnn import FasterRcnn
from simpledet_tpu.models.heads import bbox_head_loss, bbox_head_predict
from simpledet_tpu.ops.losses import sigmoid_cross_entropy
from simpledet_tpu.targets.mask_target import batched_mask_target
from simpledet_tpu.targets.proposal_target import batched_proposal_target

# MSRA / He-normal fan-out init (mx.init.Xavier gaussian, factor_type=out,
# magnitude=2)
msra_out_normal = nn.initializers.variance_scaling(2.0, "fan_out",
                                                   "truncated_normal")


class MaskHead4Conv(nn.Module):
    """[B, F, P, P, C] roi feats -> [B, F, 2P, 2P, num_class] logits."""
    num_class: int
    dim_reduced: int = 256
    norm: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feat):
        b, f, p, _, c = roi_feat.shape
        x = roi_feat.reshape(b * f, p, p, c).astype(self.dtype)
        for i in range(1, 5):
            x = nn.Conv(self.dim_reduced, (3, 3), kernel_init=msra_out_normal,
                        dtype=self.dtype, name=f"mask_conv{i}")(x)
            if self.norm is not None:
                x = self.norm(name=f"mask_conv{i}_norm")(x)
            x = nn.relu(x)
        x = nn.ConvTranspose(self.dim_reduced, (2, 2), strides=(2, 2),
                             kernel_init=msra_out_normal, dtype=self.dtype,
                             name="mask_up")(x)
        x = nn.relu(x).astype(jnp.float32)
        logit = nn.Conv(self.num_class, (1, 1), kernel_init=msra_out_normal,
                        name="mask_fcn_logit")(x)
        return logit.reshape(b, f, 2 * p, 2 * p, self.num_class)


class MaskFasterRcnn(FasterRcnn):
    """Adds the mask branch on top of the FasterRcnn assembly."""
    mask_head: nn.Module = None
    p_mask: Any = None
    p_mask_roi: Any = None
    p_test: Any = None           # BboxPostProcessor params (TestParam)

    def extract_mask_rois(self, pyramid, rois):
        strides = tuple(self.p_mask_roi.stride)
        feats = [pyramid.get(f"rcnn_stride{s}", pyramid[f"stride{s}"])
                 for s in strides]  # ReduceNeck publishes rcnn_* keys
        return batched_multilevel_roi_align(
            feats, rois, strides, out_size=self.p_mask_roi.out_size,
            canonical_scale=self.p_mask_roi.roi_canonical_scale or 224,
            canonical_level=self.p_mask_roi.roi_canonical_level or 4)

    @nn.compact
    def __call__(self, data, im_info, gt_bbox=None, gt_poly=None,
                 mode="train"):
        pad_hw = data.shape[1:3]
        pyr = self.pyramid(data)
        rpn_out = self.rpn_module(pyr)

        if mode == "rpn_test":
            boxes, scores = self.rpn.proposals(rpn_out, im_info, pad_hw,
                                               is_train=False)
            return {"proposal": boxes, "proposal_score": scores}

        ps = self.p_rpn.subsample_proposal
        num_fg = int(ps.image_roi * ps.fg_fraction)
        mask_size = self.p_mask.resolution or 28

        if mode == "train":
            rng_anchor = self.make_rng("sampling")
            rng_sample = self.make_rng("sampling")
            rpn_losses, rpn_aux = self.rpn.loss(rng_anchor, rpn_out, gt_bbox,
                                                im_info, pad_hw)
            proposals, _ = self.rpn.proposals(rpn_out, im_info, pad_hw,
                                              is_train=True)
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

            # mask branch on the fg-first prefix
            mask_rois = sample["rois"][:, :num_fg]
            mask_gt_idx = sample["gt_index"][:, :num_fg]
            mask_fg = sample["fg_mask"][:, :num_fg]
            mask_cls = sample["label"][:, :num_fg].astype(jnp.int32)
            targets = batched_mask_target(mask_rois, mask_gt_idx, mask_fg,
                                          gt_poly, mask_size=mask_size)
            targets = jax.lax.stop_gradient(targets)

            mask_feat = self.extract_mask_rois(pyr, mask_rois)
            mask_logit = self.mask_head(mask_feat)      # [B,F,M,M,C]
            fg_logit = jnp.take_along_axis(
                mask_logit, mask_cls[:, :, None, None, None], axis=-1
            )[..., 0]                                    # [B,F,M,M]
            mask_loss = sigmoid_cross_entropy(fg_logit, targets)
            losses["mask_loss"] = mask_loss

            losses.update(rpn_losses)
            aux = dict(rpn_aux)
            aux["bbox_label"] = sample["label"]
            aux["bbox_cls_logit"] = cls_logit
            aux["mask_target"] = targets
            return losses, aux

        # test: proposals -> bbox head -> in-graph per-class NMS -> mask head
        from simpledet_tpu.eval.postprocess import per_class_nms

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

        pt = self.p_test
        max_det = (pt and pt.max_det_per_image) or 100
        nms_thr = (pt and pt.nms and pt.nms.thr) or 0.5
        score_thr = (pt and pt.min_det_score) or 0.05
        post = jax.vmap(
            lambda s, b: per_class_nms(s, b, score_thr=score_thr,
                                       nms_thr=nms_thr, max_det=max_det))
        post_boxes, post_scores, post_cls, post_valid = post(score, boxes)

        mask_feat = self.extract_mask_rois(pyr, post_boxes)
        mask_logit = self.mask_head(mask_feat)           # [B,D,M,M,C]
        mask_prob = jax.nn.sigmoid(mask_logit)
        # gather the predicted class channel
        fg_prob = jnp.take_along_axis(
            mask_prob, post_cls.astype(jnp.int32)[:, :, None, None, None],
            axis=-1)[..., 0]                             # [B,D,M,M]
        return {"cls_score": post_scores, "bbox_xyxy": post_boxes,
                "cls": post_cls, "det_valid": post_valid,
                "mask_prob": fg_prob}
