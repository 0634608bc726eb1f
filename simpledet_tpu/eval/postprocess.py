"""Test-time post-processing: batched per-class NMS on device.

Replaces the reference's multiprocessing-pool cython NMS
(detection_test.py:224-267): per-class greedy NMS vmapped over classes on
the accelerator, then a global top-k cap per image.
"""
from functools import partial

import jax
import jax.numpy as jnp

from simpledet_tpu.ops.nms import NEG_INF, nms, set_nms, soft_nms


@partial(jax.jit, static_argnames=("max_per_class", "max_det", "nms_type"))
def per_class_nms(cls_score, bbox_xyxy, *, score_thr=0.05, nms_thr=0.5,
                  max_per_class=100, max_det=100, nms_type="nms",
                  set_index=None):
    """Single image. cls_score: [R, C] (incl. background col 0);
    bbox_xyxy: [R, 4*C] per-class boxes (class-agnostic already tiled).
    set_index: optional [R] set ids for nms_type="setnms" (crowd double
    predictions, reference detection_test.py:226-253).

    Returns (boxes [max_det, 4], scores [max_det], classes [max_det] int32
    in 1..C-1, valid [max_det]) sorted by score.
    """
    r, c = cls_score.shape
    boxes_c = bbox_xyxy.reshape(r, c, 4)

    def one_class(scores, boxes):
        valid = scores >= score_thr
        if nms_type == "softnms":
            ob, osc, _, ov = soft_nms(boxes, scores, max_per_class,
                                      valid=valid)
        elif nms_type == "setnms":
            ob, osc, _, ov = set_nms(boxes, scores, set_index, nms_thr,
                                     max_per_class, valid=valid)
        else:
            ob, osc, _, ov = nms(boxes, scores, nms_thr, max_per_class,
                                 valid=valid)
        return ob, osc, ov

    # skip background class 0
    fg_scores = jnp.swapaxes(cls_score[:, 1:], 0, 1)         # [C-1, R]
    fg_boxes = jnp.swapaxes(boxes_c[:, 1:], 0, 1)            # [C-1, R, 4]
    ob, osc, ov = jax.vmap(one_class)(fg_scores, fg_boxes)   # [C-1, K, ...]

    flat_scores = jnp.where(ov, osc, NEG_INF).reshape(-1)
    flat_boxes = ob.reshape(-1, 4)
    n_cls = c - 1
    cls_ids = jnp.broadcast_to(
        jnp.arange(1, c)[:, None], (n_cls, ob.shape[1])).reshape(-1)

    top_scores, idx = jax.lax.top_k(flat_scores, max_det)
    keep = top_scores > NEG_INF / 2
    out_boxes = jnp.where(keep[:, None], flat_boxes[idx], 0.0)
    out_cls = jnp.where(keep, cls_ids[idx], 0)
    return out_boxes, jnp.where(keep, top_scores, 0.0), out_cls, keep
