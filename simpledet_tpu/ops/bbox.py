"""Pure-jnp box geometry core.

Implements the box conventions of the reference framework (legacy "+1" pixel
widths, Detectron-style delta clipping) as jit-friendly, batch-broadcastable
jnp functions. Semantics mirror:
  - reference operator_py/bbox_transform.py:52-126 (encode/decode/clip)
  - reference operator_py/cython/bbox.pyx (IoU with +1 widths)

All functions take arrays shaped [..., N, 4] in (x1, y1, x2, y2) order and are
safe under jit/vmap; no data-dependent shapes.
"""
import math

import jax.numpy as jnp

# Detectron-convention clip on dw/dh so exp() can't overflow
# (reference operator_py/bbox_transform.py:5).
BBOX_XFORM_CLIP = math.log(1000.0 / 16.0)


def bbox_overlaps(boxes, query_boxes, legacy_plus_one=True):
    """IoU matrix between boxes [..., N, 4] and query_boxes [..., K, 4] -> [..., N, K].

    With legacy_plus_one=True widths/heights are computed as x2-x1+1 to match
    the reference's cython kernel (operator_py/cython/bbox.pyx).
    """
    off = 1.0 if legacy_plus_one else 0.0
    b = boxes[..., :, None, :]   # [..., N, 1, 4]
    q = query_boxes[..., None, :, :]  # [..., 1, K, 4]
    iw = jnp.minimum(b[..., 2], q[..., 2]) - jnp.maximum(b[..., 0], q[..., 0]) + off
    ih = jnp.minimum(b[..., 3], q[..., 3]) - jnp.maximum(b[..., 1], q[..., 1]) + off
    inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
    area_b = (b[..., 2] - b[..., 0] + off) * (b[..., 3] - b[..., 1] + off)
    area_q = (q[..., 2] - q[..., 0] + off) * (q[..., 3] - q[..., 1] + off)
    union = area_b + area_q - inter
    return jnp.where(union > 0, inter / union, 0.0)


def _ctr_wh(boxes, off):
    w = boxes[..., 2] - boxes[..., 0] + off
    h = boxes[..., 3] - boxes[..., 1] + off
    cx = boxes[..., 0] + 0.5 * (w - off)
    cy = boxes[..., 1] + 0.5 * (h - off)
    return cx, cy, w, h


def encode_boxes(ex_rois, gt_rois, means=None, stds=None, legacy_plus_one=True):
    """Box regression targets from ex_rois to gt_rois, both [..., N, 4] -> [..., N, 4].

    Mirrors reference nonlinear_transform (operator_py/bbox_transform.py:52-79),
    optionally normalized by (means, stds) as the C++ ProposalTarget does
    (operator_cxx/proposal_target.cc NonLinearTransformAndNormalization).
    """
    off = 1.0 if legacy_plus_one else 0.0
    ex_cx, ex_cy, ex_w, ex_h = _ctr_wh(ex_rois, off)
    gt_cx, gt_cy, gt_w, gt_h = _ctr_wh(gt_rois, off)
    dx = (gt_cx - ex_cx) / (ex_w + 1e-14)
    dy = (gt_cy - ex_cy) / (ex_h + 1e-14)
    dw = jnp.log(jnp.maximum(gt_w, 1e-14) / jnp.maximum(ex_w, 1e-14))
    dh = jnp.log(jnp.maximum(gt_h, 1e-14) / jnp.maximum(ex_h, 1e-14))
    t = jnp.stack([dx, dy, dw, dh], axis=-1)
    if means is not None:
        t = t - jnp.asarray(means, t.dtype)
    if stds is not None:
        t = t / jnp.asarray(stds, t.dtype)
    return t


def decode_boxes(boxes, deltas, means=None, stds=None,
                 xform_clip=BBOX_XFORM_CLIP, legacy_plus_one=True):
    """Apply regression deltas [..., N, 4*C] to boxes [..., N, 4] -> [..., N, 4*C].

    Mirrors reference nonlinear_pred (operator_py/bbox_transform.py:81-126) and
    the DecodeBBox op (operator_cxx/contrib/decodebbox-inl.h).
    """
    off = 1.0 if legacy_plus_one else 0.0
    shp = deltas.shape
    deltas4 = deltas.reshape(shp[:-1] + (shp[-1] // 4, 4))
    if stds is not None:
        deltas4 = deltas4 * jnp.asarray(stds, deltas.dtype)
    if means is not None:
        deltas4 = deltas4 + jnp.asarray(means, deltas.dtype)
    cx, cy, w, h = _ctr_wh(boxes, off)
    dx, dy = deltas4[..., 0], deltas4[..., 1]
    dw = jnp.minimum(deltas4[..., 2], xform_clip)
    dh = jnp.minimum(deltas4[..., 3], xform_clip)
    pred_cx = dx * w[..., None] + cx[..., None]
    pred_cy = dy * h[..., None] + cy[..., None]
    pred_w = jnp.exp(dw) * w[..., None]
    pred_h = jnp.exp(dh) * h[..., None]
    out = jnp.stack([
        pred_cx - 0.5 * (pred_w - off),
        pred_cy - 0.5 * (pred_h - off),
        pred_cx + 0.5 * (pred_w - off),
        pred_cy + 0.5 * (pred_h - off),
    ], axis=-1)
    return out.reshape(shp)


def clip_boxes(boxes, im_hw, legacy_plus_one=True):
    """Clip boxes [..., 4*C] to image bounds. im_hw: (h, w) scalars or [..., 2].

    Mirrors reference clip_boxes (operator_py/bbox_transform.py:34-49):
    coordinates clipped to [0, dim-1] in the legacy convention.
    """
    off = 1.0 if legacy_plus_one else 0.0
    im_hw = jnp.asarray(im_hw)
    h = im_hw[..., 0]
    w = im_hw[..., 1]
    shp = boxes.shape
    b = boxes.reshape(shp[:-1] + (shp[-1] // 4, 4))
    # right-pad h/w with singleton dims so leading (batch) axes align
    while h.ndim < b.ndim - 1:
        h = h[..., None]
        w = w[..., None]
    x1 = jnp.clip(b[..., 0], 0.0, w - off)
    y1 = jnp.clip(b[..., 1], 0.0, h - off)
    x2 = jnp.clip(b[..., 2], 0.0, w - off)
    y2 = jnp.clip(b[..., 3], 0.0, h - off)
    return jnp.stack([x1, y1, x2, y2], axis=-1).reshape(shp)


def flip_boxes(boxes, im_width, legacy_plus_one=True):
    """Horizontally flip boxes [..., N, 4] within an image of width im_width.

    Mirrors reference flip_boxes (operator_py/bbox_transform.py:164-169).
    """
    off = 1.0 if legacy_plus_one else 0.0
    x1 = im_width - off - boxes[..., 2]
    x2 = im_width - off - boxes[..., 0]
    return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)


def xyxy_to_xywh(boxes, legacy_plus_one=True):
    off = 1.0 if legacy_plus_one else 0.0
    w = boxes[..., 2] - boxes[..., 0] + off
    h = boxes[..., 3] - boxes[..., 1] + off
    return jnp.stack([boxes[..., 0], boxes[..., 1], w, h], axis=-1)


def xywh_to_xyxy(boxes, legacy_plus_one=True):
    off = 1.0 if legacy_plus_one else 0.0
    x2 = boxes[..., 0] + boxes[..., 2] - off
    y2 = boxes[..., 1] + boxes[..., 3] - off
    return jnp.stack([boxes[..., 0], boxes[..., 1], x2, y2], axis=-1)
