"""FreeAnchor: learning-to-match loss on the RetinaNet head.

TPU rewrite of the reference models/FreeAnchor/ops.py:
  * positive loss (:67-139): per gt, a bag of its pre_anchor_top_n
    highest-IoU anchors; matched prob = cls_prob[anchor, gt_class] *
    exp(-0.75 * smooth_l1(bbox)); mean-max weighting
    w = (1/(1-p)) / sum(1/(1-p)); loss = -alpha log(sum w p) / num_gt.
  * negative loss (:140-211): decode predictions, saturated-linear box prob
    P(a in gt) = clip((IoU - thr) / (max_IoU - thr)); per-anchor argmax gt's
    class one-hot scales it; focal-style -(p(1-P))^gamma log(1-p(1-P)),
    normalized by num_gt * top_n, scaled by (1 - alpha).
  * test decode (:213-270 _proposal_retina): top-k anchors by max class
    prob, decode, full per-class score rows.

All loops over images are vmapped; gather_nd becomes take_along_axis.
"""
import math
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from simpledet_tpu.models.retinanet import RetinaNet, RetinaNetHead
from simpledet_tpu.ops.bbox import bbox_overlaps, clip_boxes, decode_boxes, \
    encode_boxes
from simpledet_tpu.ops.losses import smooth_l1
from simpledet_tpu.ops.topk import fast_top_k


def _positive_loss(anchors, gt, cls_prob, bbox_pred, *, alpha, top_n,
                   mean, std):
    """Single image. anchors [N,4], gt [G,5], cls_prob [N,C-1],
    bbox_pred [N,4]. Returns per-gt bag loss sum (normalization applied by
    caller)."""
    gt_valid = gt[:, 4] > 0
    iou = bbox_overlaps(gt[:, :4], anchors)                 # [G, N]
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    _, idx = jax.lax.top_k(iou, top_n)                      # [G, K]

    cls_idx = jnp.maximum(gt[:, 4] - 1, 0).astype(jnp.int32)
    matched_cls = cls_prob[idx, cls_idx[:, None]]           # [G, K]
    m_anchor = anchors[idx]                                 # [G, K, 4]
    m_pred = bbox_pred[idx]
    target = encode_boxes(m_anchor, gt[:, None, :4] * jnp.ones_like(m_anchor),
                          means=mean, stds=std)
    scalar = 0.11
    bl = smooth_l1(m_pred - target, sigma=math.sqrt(1 / scalar)) * 0.75
    box_prob = jnp.exp(-jnp.sum(bl, -1))                    # [G, K]

    p = matched_cls * box_prob
    p = jnp.where(gt_valid[:, None], p, 1.0)
    w = 1.0 / jnp.maximum(1.0 - p, 1e-12)
    w = w / jnp.sum(w, -1, keepdims=True)
    bag = jnp.sum(w * p, -1)                                # [G]
    loss = -alpha * jnp.log(jnp.clip(bag, 1e-12, 1.0))
    return jnp.where(gt_valid, loss, 0.0)


def _negative_loss(anchors, gt, cls_prob, bbox_pred, im_info, *, alpha,
                   gamma, bbox_thr, mean, std, num_fg_class):
    """Single image. Returns scalar sum (normalization by caller)."""
    gt_valid = gt[:, 4] > 0
    pred = decode_boxes(anchors, bbox_pred, means=mean, stds=std)
    pred = clip_boxes(pred, im_info[:2])
    iou = bbox_overlaps(gt[:, :4], pred)                    # [G, N]
    iou = jnp.where(gt_valid[:, None], iou, 0.0)
    t1 = bbox_thr
    t2 = jnp.maximum(jnp.max(iou, 1, keepdims=True), t1 + 1e-12)
    gt_pred_prob = jnp.clip((iou - t1) / (t2 - t1), 0.0, 1.0)  # [G, N]

    gt_idx = jnp.argmax(gt_pred_prob, axis=0)               # [N]
    anchor_cls = gt[gt_idx, 4]                              # [N]
    onehot = jax.nn.one_hot(anchor_cls.astype(jnp.int32) - 1, num_fg_class)
    box_prob = onehot * jnp.max(gt_pred_prob, axis=0)[:, None]
    box_prob = jax.lax.stop_gradient(box_prob)

    prob = cls_prob * (1.0 - box_prob)                      # [N, C-1]
    valid = (anchor_cls > 0)[:, None]
    prob = jnp.where(valid, prob, 0.0)
    neg = -jnp.power(prob, gamma) * jnp.log(jnp.clip(1.0 - prob, 1e-12, 1.0))
    return (1.0 - alpha) * jnp.sum(neg)


class FreeAnchorRetinaNetHead(RetinaNetHead):
    """Same subnets as RetinaNet; learning-to-match losses."""

    def loss(self, level_outputs, gt_bbox, im_info, pad_hw):
        p = self.p
        cls_logit, reg_delta = self.flatten_outputs(level_outputs)
        cls_prob = jax.nn.sigmoid(cls_logit)
        anchors = jnp.asarray(
            np.concatenate(self._level_anchors(level_outputs), 0))
        mean = p.head.mean or (0., 0., 0., 0.)
        std = p.head.std or (1., 1., 1., 1.)
        top_n = p.anchor_assign.pre_anchor_top_n or 50
        bbox_thr = p.anchor_assign.bbox_thr or 0.6
        alpha = p.focal_loss.alpha or 0.5
        gamma = p.focal_loss.gamma or 2.0

        pos = jax.vmap(lambda g, cp, bp: _positive_loss(
            anchors, g, cp, bp, alpha=alpha, top_n=top_n, mean=mean,
            std=std))(gt_bbox, cls_prob, reg_delta)
        neg = jax.vmap(lambda g, cp, bp, ii: _negative_loss(
            anchors, g, cp, bp, ii, alpha=alpha, gamma=gamma,
            bbox_thr=bbox_thr, mean=mean, std=std,
            num_fg_class=self.num_fg_class))(
            gt_bbox, cls_prob, reg_delta, im_info)

        num_gt = jnp.maximum(jnp.sum(gt_bbox[..., 4] > 0), 1.0)
        losses = {
            "freeanchor_positive_loss": jnp.sum(pos) / num_gt,
            "freeanchor_negative_loss": jnp.sum(neg) / (num_gt * top_n),
        }
        aux = {"num_gt": num_gt}
        return losses, aux

    def prediction(self, level_outputs, im_info, pad_hw):
        """_proposal_retina: top-k anchors by max class prob, full score rows."""
        p = self.p
        top_n = p.proposal.pre_nms_top_n or 1000
        mean = p.head.mean or (0., 0., 0., 0.)
        std = p.head.std or (1., 1., 1., 1.)
        cls_logit, reg_delta = self.flatten_outputs(level_outputs)
        cls_prob = jax.nn.sigmoid(cls_logit)                # [B, N, C-1]
        anchors = jnp.asarray(
            np.concatenate(self._level_anchors(level_outputs), 0))

        def per_image(cp, bp, ii):
            mx = jnp.max(cp, -1)
            k = min(top_n, mx.shape[0])
            _, idx = fast_top_k(mx, k)
            boxes = decode_boxes(anchors[idx], bp[idx], means=mean, stds=std)
            boxes = clip_boxes(boxes, ii[:2])
            scores = cp[idx]                                # [K, C-1]
            zero = jnp.zeros_like(scores[:, :1])
            return jnp.concatenate([zero, scores], -1), boxes

        scores, boxes = jax.vmap(per_image)(cls_prob, reg_delta, im_info)
        ok = jnp.ones(scores.shape[:2], bool)
        return scores, boxes, ok


class FreeAnchorRetinaNet(RetinaNet):
    pass
