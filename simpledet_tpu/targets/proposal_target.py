"""On-device ProposalTarget: RoI sampling + per-class regression targets.

Re-implements the reference C++ ProposalTarget op (operator_cxx/
proposal_target{-inl.h,.cc} SampleROI) as jit device code — removing its
GPU->CPU->GPU roundtrip (proposal_target-inl.h:146-149) from the train graph.

Semantics preserved:
  * padded rois are rows with y2 == 0 (proposal_target-inl.h:173-175)
  * padded gt are rows with class == -1 (:155-162)
  * gt boxes are appended to the proposal set unless proposal_without_gt
  * fg: IoU >= fg_thresh, random-subsampled to image_rois*fg_fraction
  * bg: IoU in [bg_thresh_lo, bg_thresh_hi), filling the remainder
  * short batches are padded by re-drawing from the non-fg pool (.cc:115-122)
  * outputs fg-first (mask head relies on the first image_rois*fg_fraction
    rows being the foreground, models/maskrcnn/builder.py:205-220)
  * per-class 4K target layout with (mean, std) normalization
"""
import jax
import jax.numpy as jnp

from simpledet_tpu.ops.bbox import bbox_overlaps, encode_boxes
from simpledet_tpu.targets.sampling import random_rank


def proposal_target(rng, rois, gt_bbox, *, image_rois, fg_fraction, fg_thr,
                    bg_thr_hi, bg_thr_lo, num_reg_class, class_agnostic=False,
                    proposal_wo_gt=False, bbox_mean=(0., 0., 0., 0.),
                    bbox_std=(0.1, 0.1, 0.2, 0.2), bbox_weight=(1., 1., 1., 1.),
                    deterministic=False, output_iou=False):
    """Single image. rois: [R, 4] zero-padded; gt_bbox: [G, 5] class==-1 padded.

    Returns dict with:
      rois [image_rois, 4], label [image_rois], bbox_target
      [image_rois, num_reg_class*4], bbox_weight (same), match_gt_iou
      [image_rois], fg_mask [image_rois] (bool; fg-first layout).
    """
    r, g = rois.shape[0], gt_bbox.shape[0]
    rng_fg, rng_bg, rng_pad = jax.random.split(rng, 3)

    # class -1 = padding; class -2 = crowd/ignore region (excluded from
    # sampling, reference models/crowdhuman/bbox_target.py:19-22)
    gt_valid = gt_bbox[:, 4] > 0
    num_gt = jnp.sum(gt_valid)
    roi_valid = rois[:, 3] > 0

    # candidate set: proposals + appended gt
    if proposal_wo_gt:
        all_rois = rois
        all_valid = roi_valid
    else:
        all_rois = jnp.concatenate([rois, gt_bbox[:, :4]], axis=0)
        all_valid = jnp.concatenate([roi_valid, gt_valid], axis=0)
    n = all_rois.shape[0]

    ov = bbox_overlaps(all_rois, gt_bbox[:, :4])           # [n, G]
    ov = jnp.where(gt_valid[None, :], ov, -1.0)
    max_ov = jnp.max(ov, axis=1)
    arg_ov = jnp.argmax(ov, axis=1)
    max_ov = jnp.where(num_gt > 0, max_ov, 0.0)
    max_ov = jnp.where(all_valid, max_ov, -1.0)

    fg_num = int(image_rois * fg_fraction)
    fg_mask = all_valid & (max_ov >= fg_thr)
    bg_mask = all_valid & (max_ov >= bg_thr_lo) & (max_ov < bg_thr_hi)
    neg_mask = all_valid & ~fg_mask                        # pad pool

    fg_rank = random_rank(rng_fg, fg_mask, deterministic)  # [n], n if not fg
    keep_fg = fg_mask & (fg_rank < fg_num)
    n_fg = jnp.sum(keep_fg)

    bg_rank = random_rank(rng_bg, bg_mask, deterministic)
    keep_bg = bg_mask & (bg_rank < (image_rois - n_fg))
    n_bg = jnp.sum(keep_bg)

    # selection priority: kept fg (by rank), then kept bg, then pad pool
    big = jnp.float32(n)
    prio = jnp.where(keep_fg, fg_rank.astype(jnp.float32),
            jnp.where(keep_bg, big + bg_rank.astype(jnp.float32),
             jnp.where(neg_mask,
                       2 * big + random_rank(rng_pad, neg_mask,
                                             deterministic).astype(jnp.float32),
                       jnp.inf)))
    order = jnp.argsort(prio)                              # selectable first
    n_pad_pool = jnp.sum(neg_mask & ~keep_bg)
    n_selectable = n_fg + n_bg + n_pad_pool
    # wrap around the pad pool when there are too few candidates
    # (reference pads by re-drawing from the non-fg pool, .cc:115-122)
    pick_pos = jnp.arange(image_rois)
    wrapped = (n_fg + n_bg + jnp.mod(pick_pos - (n_fg + n_bg),
                                     jnp.maximum(n_pad_pool, 1)))
    in_pool = pick_pos < n_selectable
    sel = order[jnp.where(in_pool, pick_pos, wrapped)]
    # rows that cannot be filled at all (empty pad pool) stay zeroed
    sel_fillable = in_pool | (n_pad_pool > 0)

    sel_rois = jnp.where(sel_fillable[:, None], all_rois[sel], 0.0)
    sel_is_fg = (pick_pos < n_fg) & sel_fillable
    sel_gt_idx = arg_ov[sel]
    sel_label = jnp.where(sel_is_fg & (num_gt > 0),
                          gt_bbox[sel_gt_idx, 4], 0.0)
    sel_iou = jnp.where(sel_fillable & (num_gt > 0),
                        jnp.maximum(max_ov[sel], 0.0), 0.0)

    targets = encode_boxes(sel_rois, gt_bbox[sel_gt_idx, :4],
                           means=bbox_mean, stds=bbox_std)
    # targets are only defined for fg rows (py-faster-rcnn convention)
    targets = jnp.where(sel_is_fg[:, None], targets, 0.0)

    # per-class 4K expansion
    if class_agnostic:
        reg_cls = jnp.minimum(sel_label, 1.0).astype(jnp.int32)
    else:
        reg_cls = sel_label.astype(jnp.int32)
    onehot = jax.nn.one_hot(reg_cls, num_reg_class, dtype=targets.dtype)
    bbox_target = (onehot[:, :, None] * targets[:, None, :]).reshape(
        image_rois, num_reg_class * 4)
    w = jnp.asarray(bbox_weight, targets.dtype)
    weight_rows = jnp.where(sel_is_fg[:, None], w[None, :], 0.0)
    bbox_w = (onehot[:, :, None] * weight_rows[:, None, :]).reshape(
        image_rois, num_reg_class * 4)

    out = {
        "rois": sel_rois,
        "label": sel_label,
        "bbox_target": bbox_target,
        "bbox_weight": bbox_w,
        "fg_mask": sel_is_fg,
    }
    if output_iou:
        out["match_gt_iou"] = sel_iou
    out["gt_index"] = jnp.where(sel_is_fg, sel_gt_idx, -1)
    return out


def proposal_target_double(rng, rois, gt_bbox, *, fg_thr, bbox_mean,
                           bbox_std, num_reg_class, class_agnostic, **kw):
    """Double-prediction sampling for crowd scenes (reference
    models/crowdhuman/bbox_sec_target.py): the usual sample plus SECOND-best
    gt targets per sampled roi (label 0 when the 2nd IoU < fg_thr)."""
    sample = proposal_target(rng, rois, gt_bbox, fg_thr=fg_thr,
                             bbox_mean=bbox_mean, bbox_std=bbox_std,
                             num_reg_class=num_reg_class,
                             class_agnostic=class_agnostic, **kw)
    sel_rois = sample["rois"]
    gt_valid = gt_bbox[:, 4] > 0
    ov = bbox_overlaps(sel_rois, gt_bbox[:, :4])
    ov = jnp.where(gt_valid[None, :], ov, -1.0)
    # mask the best gt column per roi, take the runner-up
    best = jnp.argmax(ov, axis=1)
    masked = ov.at[jnp.arange(ov.shape[0]), best].set(-1.0)
    iou2 = jnp.max(masked, axis=1)
    idx2 = jnp.argmax(masked, axis=1)
    fg2 = (iou2 >= fg_thr) & sample["fg_mask"]
    label2 = jnp.where(fg2, gt_bbox[idx2, 4], 0.0)
    targets2 = encode_boxes(sel_rois, gt_bbox[idx2, :4],
                            means=bbox_mean, stds=bbox_std)
    targets2 = jnp.where(fg2[:, None], targets2, 0.0)
    if class_agnostic:
        reg_cls2 = jnp.minimum(label2, 1.0).astype(jnp.int32)
    else:
        reg_cls2 = label2.astype(jnp.int32)
    onehot2 = jax.nn.one_hot(reg_cls2, num_reg_class, dtype=targets2.dtype)
    sample["sec_label"] = label2
    sample["sec_bbox_target"] = (onehot2[:, :, None]
                                 * targets2[:, None, :]).reshape(
        sel_rois.shape[0], num_reg_class * 4)
    w = jnp.asarray(kw.get("bbox_weight", (1., 1., 1., 1.)), targets2.dtype)
    wrows = jnp.where(fg2[:, None], w[None, :], 0.0)
    sample["sec_bbox_weight"] = (onehot2[:, :, None]
                                 * wrows[:, None, :]).reshape(
        sel_rois.shape[0], num_reg_class * 4)
    return sample


def batched_proposal_target_double(rng, rois, gt_bbox, **kw):
    b = rois.shape[0]
    rngs = jax.random.split(rng, b)
    return jax.vmap(lambda r, ro, gt: proposal_target_double(r, ro, gt,
                                                             **kw))(
        rngs, rois, gt_bbox)


def batched_proposal_target(rng, rois, gt_bbox, **kw):
    """vmapped over images. rois: [B, R, 4]; gt_bbox: [B, G, 5]."""
    b = rois.shape[0]
    rngs = jax.random.split(rng, b)
    return jax.vmap(lambda r, ro, gt: proposal_target(r, ro, gt, **kw))(
        rngs, rois, gt_bbox)
