"""Mask Scoring R-CNN (reference models/msrcnn/builder.py).

MaskIoUHead (:65-160): input = concat(mask roi features [14x14xC],
2x-maxpooled fg-class mask logits [28->14, 1ch]) -> 3x conv3x3(256) ->
conv3x3 stride2 -> 2x fc(1024) -> fc(num_class) regressing the mask IoU.
Training target (maskiou_compute.py): IoU between the binarized predicted
mask and the gt mask, with the gt cell count corrected by mask_ratio
(cropped-gt-area / full-gt-area) so IoU is against the FULL instance; L2
loss over fg rois. At test the predicted class's mask IoU multiplies the
classification score (mask score).

mask_ratio is computed on device: full polygon area via the shoelace
formula over the packed edge tensor; cropped area from the rasterized
target and the roi size.
"""
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from simpledet_tpu.models.mask_rcnn import MaskFasterRcnn, msra_out_normal
from simpledet_tpu.models.fpn import xavier_in_uniform
from simpledet_tpu.targets.mask_target import batched_mask_target
from simpledet_tpu.targets.proposal_target import batched_proposal_target


def polygon_area(edges):
    """Shoelace area of packed edges [..., E, 5]; holes are not subtracted
    (matches the reference's per-segment rleFrPoly + union)."""
    valid = edges[..., 4] >= 0
    cross = (edges[..., 0] * edges[..., 3] - edges[..., 2] * edges[..., 1])
    return 0.5 * jnp.abs(jnp.sum(jnp.where(valid, cross, 0.0), axis=-1))


def maskiou_target(mask_prob, mask_tgt, rois, gt_poly, gt_index, fg_mask):
    """Per-roi mask IoU target (reference maskiou_compute.py).

    mask_prob/mask_tgt: [F, M, M]; rois [F, 4]; gt_poly [G, E, 5];
    gt_index/fg_mask: [F]. Returns (iou [F], weight [F])."""
    m = mask_tgt.shape[-1]
    pred = mask_prob > 0.5
    tgt = mask_tgt > 0.5
    inter = jnp.sum(pred & tgt, axis=(1, 2)).astype(jnp.float32)
    pred_sum = jnp.sum(pred, axis=(1, 2)).astype(jnp.float32)
    tgt_sum = jnp.sum(tgt, axis=(1, 2)).astype(jnp.float32)

    # cell area of the roi grid; full-instance cell count = full_area / cell
    w = jnp.maximum(rois[:, 2] - rois[:, 0], 1.0)
    h = jnp.maximum(rois[:, 3] - rois[:, 1], 1.0)
    cell = (w * h) / (m * m)
    idx = jnp.clip(gt_index, 0, gt_poly.shape[0] - 1)
    full_area = polygon_area(gt_poly[idx])
    full_cells = jnp.maximum(full_area / jnp.maximum(cell, 1e-6), tgt_sum)

    union = jnp.maximum(full_cells + pred_sum - inter, 1.0)
    iou = inter / union
    weight = fg_mask.astype(jnp.float32)
    return jnp.where(fg_mask, iou, 0.0), weight


class MaskIoUHead(nn.Module):
    """(mask_roi_feat [B,F,P,P,C], fg mask logits [B,F,2P,2P]) ->
    iou pred [B,F,num_class]."""
    num_class: int
    conv_channel: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feat, fg_mask_logit):
        b, f, p, _, c = roi_feat.shape
        x = roi_feat.reshape(b * f, p, p, c).astype(self.dtype)
        m = fg_mask_logit.reshape(b * f, 2 * p, 2 * p, 1)
        m = nn.max_pool(m, (2, 2), strides=(2, 2)).astype(self.dtype)
        x = jnp.concatenate([x, m], axis=-1)
        for i in range(3):
            x = nn.Conv(self.conv_channel, (3, 3),
                        kernel_init=msra_out_normal, dtype=self.dtype,
                        name=f"iou_head_conv_{i}")(x)
            x = nn.relu(x)
        x = nn.Conv(self.conv_channel, (3, 3), strides=(2, 2),
                    kernel_init=msra_out_normal, dtype=self.dtype,
                    name="iou_head_conv_3")(x)
        x = nn.relu(x)
        x = x.reshape(b * f, -1)
        x = nn.relu(nn.Dense(1024, kernel_init=xavier_in_uniform,
                             dtype=self.dtype, name="iou_head_FC1")(x))
        x = nn.relu(nn.Dense(1024, kernel_init=xavier_in_uniform,
                             dtype=self.dtype, name="iou_head_FC2")(x))
        out = nn.Dense(self.num_class,
                       kernel_init=nn.initializers.normal(0.01),
                       name="iou_head_pred")(x.astype(jnp.float32))
        return out.reshape(b, f, self.num_class)


class MaskScoringFasterRcnn(MaskFasterRcnn):
    """Mask R-CNN + MaskIoU head (reference MaskScoringFasterRcnn:13)."""
    maskiou_head: nn.Module = None

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
            from simpledet_tpu.models.heads import bbox_head_loss
            from simpledet_tpu.ops.losses import sigmoid_cross_entropy

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
                sample["bbox_target"], sample["bbox_weight"])

            mask_rois = sample["rois"][:, :num_fg]
            mask_gt_idx = sample["gt_index"][:, :num_fg]
            mask_fg = sample["fg_mask"][:, :num_fg]
            mask_cls = sample["label"][:, :num_fg].astype(jnp.int32)
            targets = batched_mask_target(mask_rois, mask_gt_idx, mask_fg,
                                          gt_poly, mask_size=mask_size)
            targets = jax.lax.stop_gradient(targets)

            mask_feat = self.extract_mask_rois(pyr, mask_rois)
            mask_logit = self.mask_head(mask_feat)
            fg_logit = jnp.take_along_axis(
                mask_logit, mask_cls[:, :, None, None, None], axis=-1)[..., 0]
            losses["mask_loss"] = sigmoid_cross_entropy(fg_logit, targets)

            # maskiou branch
            mask_prob = jax.nn.sigmoid(jax.lax.stop_gradient(fg_logit))
            iou_tgt, iou_w = jax.vmap(maskiou_target)(
                mask_prob, jnp.maximum(targets, 0.0), mask_rois, gt_poly,
                mask_gt_idx, mask_fg)
            iou_pred_all = self.maskiou_head(mask_feat, fg_logit)
            iou_pred = jnp.take_along_axis(
                iou_pred_all, mask_cls[:, :, None], axis=-1)[..., 0]
            l2 = 0.5 * (iou_pred - iou_tgt) ** 2
            losses["maskiou_loss"] = jnp.sum(l2 * iou_w) / jnp.maximum(
                jnp.sum(iou_w), 1.0)

            losses.update(rpn_losses)
            aux = dict(rpn_aux)
            aux["bbox_label"] = sample["label"]
            aux["bbox_cls_logit"] = cls_logit
            return losses, aux

        # test: Mask R-CNN flow + mask score = cls score * predicted maskiou
        from simpledet_tpu.eval.postprocess import per_class_nms
        from simpledet_tpu.models.heads import bbox_head_predict

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

        pt_ = self.p_test
        max_det = (pt_ and pt_.max_det_per_image) or 100
        nms_thr = (pt_ and pt_.nms and pt_.nms.thr) or 0.5
        score_thr = (pt_ and pt_.min_det_score) or 0.05
        post = jax.vmap(
            lambda s, b: per_class_nms(s, b, score_thr=score_thr,
                                       nms_thr=nms_thr, max_det=max_det))
        post_boxes, post_scores, post_cls, post_valid = post(score, boxes)
        post_cls = post_cls.astype(jnp.int32)

        mask_feat = self.extract_mask_rois(pyr, post_boxes)
        mask_logit_all = self.mask_head(mask_feat)
        fg_logit = jnp.take_along_axis(
            mask_logit_all, post_cls[:, :, None, None, None], axis=-1)[..., 0]
        iou_pred_all = self.maskiou_head(mask_feat, fg_logit)
        iou_pred = jnp.take_along_axis(iou_pred_all, post_cls[:, :, None],
                                       axis=-1)[..., 0]
        return {"cls_score": post_scores, "bbox_xyxy": post_boxes,
                "cls": post_cls, "det_valid": post_valid,
                "mask_prob": jax.nn.sigmoid(fg_logit),
                "mask_score": post_scores * iou_pred}
