"""Dense (RetinaNet-style) anchor targets — on-device, class-aware, no subsample.

Re-implements the reference's PyramidAnchorTarget2DBase for RetinaNet
(models/retinanet/input.py:33-106) as jit device code: every anchor gets a
class label (0 = background, k >= 1 = class k, -1 = ignore), regression
targets are encoded against the argmax gt for ALL anchors, and reg weights
are 1 only for positives. There is no fg/bg subsampling; normalization is by
fg count (models/retinanet/builder.py:326-333 bbox_norm / sync_loss).

Anchor order is the concatenated multi-level (level, y, x, anchor) grid so
head outputs flatten to the same layout with zero transposes.
"""
import jax
import jax.numpy as jnp

from simpledet_tpu.ops.bbox import bbox_overlaps, encode_boxes


def retina_anchor_target(anchors, gt_bbox, im_hw, *,
                         allowed_border=9999, neg_thr=0.4, pos_thr=0.5,
                         min_pos_thr=0.0, bbox_mean=None, bbox_std=None):
    """Single image.

    anchors: [N, 4] constant grid; gt_bbox: [G, 5] padded with class == -1;
    im_hw: [2] resized image (h, w).

    Returns (label [N] float in {-1, 0, 1..C}, reg_target [N, 4],
    reg_weight [N, 4], fg_count scalar >= 1).
    """
    n = anchors.shape[0]
    valid = ((anchors[:, 0] >= -allowed_border) &
             (anchors[:, 1] >= -allowed_border) &
             (anchors[:, 2] < im_hw[1] + allowed_border) &
             (anchors[:, 3] < im_hw[0] + allowed_border))

    gt_valid = gt_bbox[:, 4] > 0    # -1 padding, -2 ignore region
    num_gt = jnp.sum(gt_valid)

    ov = bbox_overlaps(anchors, gt_bbox[:, :4])
    ov = jnp.where(gt_valid[None, :], ov, -1.0)
    ov = jnp.where(valid[:, None], ov, -1.0)

    max_ov = jnp.max(ov, axis=1)
    arg_ov = jnp.argmax(ov, axis=1)
    gt_max = jnp.max(ov, axis=0)

    matched_cls = gt_bbox[arg_ov, 4]
    # per-gt best anchors (reference gt_argmax quirk incl. min_pos_thr gate)
    best_hits = (ov == gt_max[None, :]) & (ov >= min_pos_thr) & gt_valid[None, :]
    is_gt_best = jnp.any(best_hits, axis=1)
    # class of the first gt this anchor is best for (reference assigns
    # gt_bbox[gt_argmax[1], 4]; later writes win but argmax ordering is an
    # acceptable tie-break at identical IoU)
    best_gt_idx = jnp.argmax(best_hits, axis=1)
    best_cls = gt_bbox[best_gt_idx, 4]

    label = jnp.full((n,), -1.0)
    label = jnp.where(max_ov < neg_thr, 0.0, label)
    label = jnp.where(is_gt_best, best_cls, label)
    # thresholded positives override (reference assigns argmax gt's class)
    label = jnp.where(max_ov >= pos_thr, matched_cls, label)
    label = jnp.where(num_gt == 0, 0.0, label)
    label = jnp.where(valid, label, -1.0)

    target = encode_boxes(anchors, gt_bbox[arg_ov, :4],
                          means=bbox_mean, stds=bbox_std)
    target = jnp.where(num_gt > 0, target, 0.0)
    fg = (label >= 1.0)[:, None]
    weight = jnp.where(fg, 1.0, 0.0) * jnp.ones((n, 4))
    fg_count = jnp.maximum(jnp.sum(label >= 1.0), 1)
    return label, target, weight, fg_count


def batched_retina_anchor_target(anchors, gt_bbox, im_hw, **kw):
    """vmapped over images. gt_bbox: [B, G, 5], im_hw: [B, 2]."""
    fn = lambda g, hw: retina_anchor_target(anchors, g, hw, **kw)
    return jax.vmap(fn)(gt_bbox, im_hw)
