"""Pure-numpy oracle implementations of the reference semantics.

These are independent re-implementations (from the documented behavior of
reference operator_py/bbox_transform.py, cython/cpu_nms.pyx and
core/detection_input.py AnchorTarget2D) used as ground truth for the
device-side jnp/Pallas code.
"""
import numpy as np


def np_bbox_overlaps(boxes, query_boxes, legacy=True):
    off = 1.0 if legacy else 0.0
    n, k = boxes.shape[0], query_boxes.shape[0]
    out = np.zeros((n, k), dtype=np.float64)
    for j in range(k):
        qa = ((query_boxes[j, 2] - query_boxes[j, 0] + off) *
              (query_boxes[j, 3] - query_boxes[j, 1] + off))
        for i in range(n):
            iw = min(boxes[i, 2], query_boxes[j, 2]) - max(boxes[i, 0], query_boxes[j, 0]) + off
            if iw > 0:
                ih = min(boxes[i, 3], query_boxes[j, 3]) - max(boxes[i, 1], query_boxes[j, 1]) + off
                if ih > 0:
                    ba = (boxes[i, 2] - boxes[i, 0] + off) * (boxes[i, 3] - boxes[i, 1] + off)
                    out[i, j] = iw * ih / float(ba + qa - iw * ih)
    return out


def np_encode(ex, gt, legacy=True):
    off = 1.0 if legacy else 0.0
    ew = ex[:, 2] - ex[:, 0] + off
    eh = ex[:, 3] - ex[:, 1] + off
    ecx = ex[:, 0] + 0.5 * (ew - off)
    ecy = ex[:, 1] + 0.5 * (eh - off)
    gw = gt[:, 2] - gt[:, 0] + off
    gh = gt[:, 3] - gt[:, 1] + off
    gcx = gt[:, 0] + 0.5 * (gw - off)
    gcy = gt[:, 1] + 0.5 * (gh - off)
    return np.stack([(gcx - ecx) / (ew + 1e-14), (gcy - ecy) / (eh + 1e-14),
                     np.log(gw / ew), np.log(gh / eh)], axis=1)


def np_decode(boxes, deltas, clip, legacy=True):
    off = 1.0 if legacy else 0.0
    w = boxes[:, 2] - boxes[:, 0] + off
    h = boxes[:, 3] - boxes[:, 1] + off
    cx = boxes[:, 0] + 0.5 * (w - off)
    cy = boxes[:, 1] + 0.5 * (h - off)
    dx, dy = deltas[:, 0::4], deltas[:, 1::4]
    dw = np.minimum(deltas[:, 2::4], clip)
    dh = np.minimum(deltas[:, 3::4], clip)
    pcx = dx * w[:, None] + cx[:, None]
    pcy = dy * h[:, None] + cy[:, None]
    pw = np.exp(dw) * w[:, None]
    ph = np.exp(dh) * h[:, None]
    out = np.zeros_like(deltas)
    out[:, 0::4] = pcx - 0.5 * (pw - off)
    out[:, 1::4] = pcy - 0.5 * (ph - off)
    out[:, 2::4] = pcx + 0.5 * (pw - off)
    out[:, 3::4] = pcy + 0.5 * (ph - off)
    return out


def np_greedy_nms(boxes, scores, thr, legacy=True):
    """Returns kept indices into (boxes, scores) in descending-score order."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    suppressed = np.zeros(len(scores), dtype=bool)
    for i in order:
        if suppressed[i]:
            continue
        keep.append(i)
        ious = np_bbox_overlaps(boxes[i:i + 1], boxes, legacy)[0]
        suppressed |= ious > thr
        suppressed[i] = True
    return np.array(keep, dtype=np.int64)


def np_anchor_target(all_anchors, gt_bbox, im_hw, allowed_border,
                     neg_thr, pos_thr, min_pos_thr, num_sample, fg_fraction,
                     rng=None, deterministic=True):
    """Reference AnchorTarget2D semantics (core/detection_input.py:353-529),
    including the documented wrong-axis gt_argmax quirk, with deterministic
    subsampling (DEBUG mode: disable the prefix)."""
    h, w = im_hw
    valid_idx = np.where((all_anchors[:, 0] >= -allowed_border) &
                         (all_anchors[:, 1] >= -allowed_border) &
                         (all_anchors[:, 2] < w + allowed_border) &
                         (all_anchors[:, 3] < h + allowed_border))[0]
    va = all_anchors[valid_idx]
    n = va.shape[0]
    cls_label = np.full((n,), -1, dtype=np.float32)
    if len(gt_bbox) > 0:
        ov = np_bbox_overlaps(va.astype(np.float32), gt_bbox.astype(np.float32))
        max_ov = ov.max(axis=1)
        arg_ov = ov.argmax(axis=1)
        gt_max = ov.max(axis=0)
        # reference quirk: np.where((overlaps == gt_max) & (overlaps >= min_pos_thr))[0]
        gt_arg = np.where((ov == gt_max) & (ov >= min_pos_thr))[0]
        cls_label[max_ov < neg_thr] = 0
        cls_label[gt_arg] = 1
        cls_label[max_ov >= pos_thr] = 1
    else:
        cls_label[:] = 0
        arg_ov = np.zeros((n,), dtype=np.int64)

    num_fg = int(fg_fraction * num_sample)
    fg_inds = np.where(cls_label == 1)[0]
    if len(fg_inds) > num_fg:
        cls_label[fg_inds[:len(fg_inds) - num_fg]] = -1  # deterministic prefix
    num_bg = num_sample - np.sum(cls_label == 1)
    bg_inds = np.where(cls_label == 0)[0]
    if len(bg_inds) > num_bg:
        cls_label[bg_inds[:len(bg_inds) - num_bg]] = -1

    reg_target = np.zeros((n, 4), dtype=np.float32)
    reg_weight = np.zeros((n, 4), dtype=np.float32)
    fg_index = np.where(cls_label == 1)[0]
    if len(fg_index) > 0 and len(gt_bbox) > 0:
        reg_target[fg_index] = np_encode(va[fg_index], gt_bbox[arg_ov[fg_index], :4])
        reg_weight[fg_index] = 1.0

    na = all_anchors.shape[0]
    out_label = np.full((na,), -1, dtype=np.float32)
    out_target = np.zeros((na, 4), dtype=np.float32)
    out_weight = np.zeros((na, 4), dtype=np.float32)
    out_label[valid_idx] = cls_label
    out_target[valid_idx] = reg_target
    out_weight[valid_idx] = reg_weight
    return out_label, out_target, out_weight
