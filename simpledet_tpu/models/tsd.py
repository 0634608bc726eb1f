"""TSD: task-aware spatial disentanglement head (reference models/TSD/).

TSDConvFCBBoxHead (bbox_head.py:53-510):
  * a shared fc predicts delta_c (per-bin 2ch offsets for the cls pooling)
    and delta_r (a per-roi translation for the reg pooling) from the
    sibling roi features (:59-121);
  * TSD cls features come from deformable RoIAlign with per-bin offsets
    (poolings.py FPNRoIAlign_DeltaC + DeformablePSROIPooling, trans_std
    0.1); TSD reg features from the delta_r-translated rois with the same
    per-roi offset tiled over bins (FPNRoIAlign_DeltaR);
  * TSD reg targets are re-encoded against the delta_r-shifted rois
    (get_reg_target :305-344);
  * progressive constraints (:363-505): cls — the TSD branch's gt-class
    prob must beat the (stop-grad) sibling prob by a margin; reg — the TSD
    branch's decoded-box IoU with its gt must beat the sibling's by a
    margin.
"""
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from simpledet_tpu.kernels.roi_align import multilevel_roi_align
from simpledet_tpu.models.faster_rcnn import FasterRcnn
from simpledet_tpu.models.fpn import xavier_in_uniform
from simpledet_tpu.models.heads import bbox_head_loss, bbox_head_predict
from simpledet_tpu.ops.bbox import bbox_overlaps, decode_boxes, encode_boxes
from simpledet_tpu.ops.losses import smooth_l1
from simpledet_tpu.targets.proposal_target import batched_proposal_target


class TSDBboxHead(nn.Module):
    """Produces sibling + TSD outputs. Called with (roi_feat, pyramid
    extractor fn, rois)."""
    num_class: int
    num_reg_class: int
    roi_size: int = 7
    fc_channels: int = 1024
    delta_scale: float = 0.1
    dtype: Any = jnp.float32

    def _fcs(self, x, name, n=2):
        for i in range(n):
            x = nn.Dense(self.fc_channels, kernel_init=xavier_in_uniform,
                         dtype=self.dtype, name=f"{name}_fc{i}")(x)
            x = nn.relu(x)
        return x

    @nn.compact
    def __call__(self, roi_feat, rois, extract_fn):
        """roi_feat [B,R,P,P,C]; rois [B,R,4]; extract_fn(rois, bin_offset)
        -> [B,R,P,P,C] deformable roi features."""
        b, r, p_, _, c = roi_feat.shape
        flat = roi_feat.reshape(b, r, -1).astype(jnp.float32)
        shared = nn.relu(nn.Dense(256, kernel_init=xavier_in_uniform,
                                  name="delta_shared_fc1")(flat))
        dc = nn.relu(nn.Dense(256, kernel_init=nn.initializers.normal(0.01),
                              name="delta_c_fc1")(shared))
        delta_c = nn.Dense(2 * self.roi_size ** 2,
                           kernel_init=nn.initializers.normal(0.01),
                           name="delta_c_fc2")(dc)          # [B,R,2PP]
        dr = nn.relu(nn.Dense(256, kernel_init=nn.initializers.normal(0.01),
                              name="delta_r_fc1")(shared))
        delta_r = nn.Dense(2, kernel_init=nn.initializers.normal(0.01),
                           name="delta_r_fc2")(dr)          # [B,R,2]

        # delta_r-shifted rois
        w = (rois[..., 2] - rois[..., 0])
        h = (rois[..., 3] - rois[..., 1])
        shift = jnp.stack([delta_r[..., 0] * self.delta_scale * w,
                           delta_r[..., 1] * self.delta_scale * h], -1)
        rois_r = rois + jnp.concatenate([shift, shift], -1)

        # TSD poolings
        ps = self.roi_size
        bin_off_c = delta_c.reshape(b, r, ps, ps, 2)
        tsd_cls_feat = extract_fn(rois, bin_off_c)
        bin_off_r = jnp.broadcast_to(delta_r[:, :, None, None, :],
                                     (b, r, ps, ps, 2))
        tsd_reg_feat = extract_fn(rois_r, bin_off_r)

        tsd_cls_x = self._fcs(tsd_cls_feat.reshape(b, r, -1)
                              .astype(jnp.float32), "TSD_pc")
        tsd_reg_x = self._fcs(tsd_reg_feat.reshape(b, r, -1)
                              .astype(jnp.float32), "TSD_pr")
        tsd_cls_logit = nn.Dense(self.num_class,
                                 kernel_init=nn.initializers.normal(0.01),
                                 name="tsd_cls_logit")(tsd_cls_x)
        tsd_bbox_delta = nn.Dense(4 * self.num_reg_class,
                                  kernel_init=nn.initializers.normal(0.01),
                                  name="tsd_reg_delta")(tsd_reg_x)

        x = self._fcs(flat, "shared")
        cls_logit = nn.Dense(self.num_class,
                             kernel_init=nn.initializers.normal(0.01),
                             name="bbox_cls_logit")(x)
        bbox_delta = nn.Dense(4 * self.num_reg_class,
                              kernel_init=nn.initializers.normal(0.001),
                              name="bbox_reg_delta")(x)
        return (cls_logit, bbox_delta, tsd_cls_logit, tsd_bbox_delta,
                rois_r)


def tsd_reg_target(rois_r, gt_bbox, label, num_reg_class, mean, std):
    """Re-encode per-class targets against the shifted rois (single image;
    reference get_reg_target :305-344)."""
    gt_valid = gt_bbox[:, 4] != -1
    ov = bbox_overlaps(rois_r, gt_bbox[:, :4])
    ov = jnp.where(gt_valid[None, :], ov, -1.0)
    arg = jnp.argmax(ov, axis=1)
    t = encode_boxes(rois_r, gt_bbox[arg, :4], means=mean, stds=std)
    fg = label >= 1
    t = jnp.where(fg[:, None], t, 0.0)
    onehot = jax.nn.one_hot(label.astype(jnp.int32), num_reg_class,
                            dtype=t.dtype)
    return (onehot[:, :, None] * t[:, None, :]).reshape(
        rois_r.shape[0], num_reg_class * 4)


def cls_pc_loss(logits, tsd_logits, label, margin=0.2):
    """Classification progressive constraint (reference :363-393)."""
    idx = label.astype(jnp.int32)[..., None]
    cls_p = jnp.take_along_axis(jax.nn.softmax(logits, -1), idx, -1)[..., 0]
    tsd_p = jnp.take_along_axis(jax.nn.softmax(tsd_logits, -1), idx,
                                -1)[..., 0]
    cls_p = jax.lax.stop_gradient(cls_p)
    m = jnp.minimum(1.0 - cls_p, margin)
    return jnp.mean(nn.relu(-(tsd_p - cls_p - m)))


def reg_pc_loss(bbox_delta, tsd_bbox_delta, rois, rois_r, gt_bbox, label,
                num_class, mean, std, margin=0.2):
    """Regression progressive constraint (single image;
    reference :395-505): IoU(tsd box, gt) must exceed IoU(sibling, gt)
    (stop-grad) by a margin, on fg rois."""
    idx = label.astype(jnp.int32)
    d = bbox_delta.reshape(-1, num_class, 4)[jnp.arange(len(idx)), idx]
    td = tsd_bbox_delta.reshape(-1, num_class, 4)[jnp.arange(len(idx)), idx]
    boxes = decode_boxes(jax.lax.stop_gradient(rois), d, means=mean,
                         stds=std)
    tsd_boxes = decode_boxes(jax.lax.stop_gradient(rois_r), td, means=mean,
                             stds=std)

    gt_valid = gt_bbox[:, 4] != -1
    ov = bbox_overlaps(rois, gt_bbox[:, :4])
    ov = jnp.where(gt_valid[None, :], ov, -1.0)
    arg = jnp.argmax(ov, axis=1)
    gts = gt_bbox[arg, :4]

    def pair_iou(a, bx):
        return jax.vmap(lambda u, v: bbox_overlaps(u[None], v[None])[0, 0])(
            a, bx)

    iou_sib = jax.lax.stop_gradient(pair_iou(boxes, gts))
    iou_tsd = pair_iou(tsd_boxes, gts)
    fg = (label >= 1).astype(jnp.float32)
    loss = nn.relu(-(iou_tsd - iou_sib - margin)) * fg
    return jnp.sum(loss) / jnp.maximum(jnp.sum(fg), 1.0)


class TSDFasterRcnn(FasterRcnn):
    """Faster R-CNN with the TSD head (reference models/TSD/faster_rcnn.py)."""
    p_tsd: Any = None

    def _extract_deform(self, pyramid, rois, bin_offset):
        strides = tuple(self.p_roi.stride)
        feats = [pyramid.get(f"rcnn_stride{s}", pyramid[f"stride{s}"])
                 for s in strides]  # ReduceNeck publishes rcnn_* keys
        fn = lambda fs, r, bo: multilevel_roi_align(
            fs, r, strides, out_size=self.p_roi.out_size,
            canonical_scale=self.p_roi.roi_canonical_scale or 224,
            canonical_level=self.p_roi.roi_canonical_level or 4,
            bin_offset=bo)
        return jax.vmap(fn)(feats, rois, bin_offset)

    @nn.compact
    def __call__(self, data, im_info, gt_bbox=None, mode="train"):
        pad_hw = data.shape[1:3]
        pyr = self.pyramid(data)
        rpn_out = self.rpn_module(pyr)

        if mode == "rpn_test":
            boxes, scores = self.rpn.proposals(rpn_out, im_info, pad_hw,
                                               is_train=False)
            return {"proposal": boxes, "proposal_score": scores}

        pt = self.p_rpn.bbox_target
        ps = self.p_rpn.subsample_proposal
        ptsd = self.p_tsd
        extract = lambda rois, bo: self._extract_deform(pyr, rois, bo)

        if mode == "train":
            rng_anchor = self.make_rng("sampling")
            rng_sample = self.make_rng("sampling")
            rpn_losses, rpn_aux = self.rpn.loss(rng_anchor, rpn_out, gt_bbox,
                                                im_info, pad_hw)
            proposals, _ = self.rpn.proposals(rpn_out, im_info, pad_hw,
                                              is_train=True)
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
            (cls_logit, bbox_delta, tsd_cls_logit, tsd_bbox_delta,
             rois_r) = self.bbox_head(roi_feat, sample["rois"], extract)

            losses = bbox_head_loss(cls_logit, bbox_delta, sample["label"],
                                    sample["bbox_target"],
                                    sample["bbox_weight"])
            # TSD branch losses: same labels, targets re-encoded vs rois_r
            rt = self.p_bbox.regress_target
            tsd_tgt = jax.vmap(lambda rr, g, l: tsd_reg_target(
                rr, g, l, pt.num_reg_class, rt.mean, rt.std))(
                jax.lax.stop_gradient(rois_r), gt_bbox, sample["label"])
            tsd_losses = bbox_head_loss(tsd_cls_logit, tsd_bbox_delta,
                                        sample["label"], tsd_tgt,
                                        sample["bbox_weight"])
            losses["tsd_cls_loss"] = tsd_losses["bbox_cls_loss"]
            losses["tsd_reg_loss"] = tsd_losses["bbox_reg_loss"]

            if ptsd is None or ptsd.pc_cls is None or ptsd.pc_cls:
                losses["tsd_cls_pc_loss"] = cls_pc_loss(
                    cls_logit, tsd_cls_logit, sample["label"],
                    margin=(ptsd and ptsd.pc_cls_margin) or 0.2)
            if ptsd is None or ptsd.pc_reg is None or ptsd.pc_reg:
                pcr = jax.vmap(lambda d, td, ro, rr, g, l: reg_pc_loss(
                    d, td, ro, rr, g, l, self.p_bbox.num_class,
                    rt.mean, rt.std,
                    margin=(ptsd and ptsd.pc_reg_margin) or 0.2))(
                    bbox_delta, tsd_bbox_delta, sample["rois"], rois_r,
                    gt_bbox, sample["label"])
                losses["tsd_reg_pc_loss"] = jnp.mean(pcr)

            losses.update(rpn_losses)
            aux = dict(rpn_aux)
            aux["bbox_label"] = sample["label"]
            aux["bbox_cls_logit"] = tsd_cls_logit
            return losses, aux

        # test: TSD branch predictions (the disentangled heads ARE the
        # final heads; sibling heads are train-time auxiliaries)
        proposals, prop_scores = self.rpn.proposals(rpn_out, im_info, pad_hw,
                                                    is_train=False)
        roi_feat = self.extract_rois(pyr, proposals)
        (cls_logit, bbox_delta, tsd_cls_logit, tsd_bbox_delta,
         rois_r) = self.bbox_head(roi_feat, proposals, extract)
        rt = self.p_bbox.regress_target
        score, boxes = bbox_head_predict(
            tsd_cls_logit, tsd_bbox_delta, rois_r, im_info,
            bbox_mean=rt.mean, bbox_std=rt.std,
            class_agnostic=rt.class_agnostic or False,
            num_class=self.p_bbox.num_class)
        return {"cls_score": score, "bbox_xyxy": boxes, "rois": proposals,
                "roi_score": prop_scores}
