"""Compat shim: reference operator_py/detectron_bbox_utils.py — Detectron-
convention box utilities (no +1 pixel widths), backed by ops/bbox with
legacy_plus_one=False."""
import numpy as np
import jax.numpy as jnp

from simpledet_tpu.ops.bbox import (bbox_overlaps, clip_boxes, decode_boxes,
                                    encode_boxes, xywh_to_xyxy, xyxy_to_xywh)


def bbox_overlaps_detectron(boxes, query):
    return np.asarray(bbox_overlaps(jnp.asarray(boxes, jnp.float32),
                                    jnp.asarray(query, jnp.float32),
                                    legacy_plus_one=False))


def bbox_transform(boxes, deltas, weights=(1.0, 1.0, 1.0, 1.0)):
    stds = tuple(1.0 / w for w in weights)
    return np.asarray(decode_boxes(jnp.asarray(boxes, jnp.float32),
                                   jnp.asarray(deltas, jnp.float32),
                                   stds=stds, legacy_plus_one=False))


def bbox_transform_inv(boxes, gt_boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    t = encode_boxes(jnp.asarray(boxes, jnp.float32),
                     jnp.asarray(gt_boxes, jnp.float32),
                     legacy_plus_one=False)
    return np.asarray(t) * np.asarray(weights)


def clip_tiled_boxes(boxes, im_shape):
    return np.asarray(clip_boxes(jnp.asarray(boxes, jnp.float32),
                                 jnp.asarray(im_shape[:2], jnp.float32),
                                 legacy_plus_one=False))


def xyxy_to_xywh_detectron(boxes):
    return np.asarray(xyxy_to_xywh(jnp.asarray(boxes, jnp.float32),
                                   legacy_plus_one=False))


def xywh_to_xyxy_detectron(boxes):
    return np.asarray(xywh_to_xyxy(jnp.asarray(boxes, jnp.float32),
                                   legacy_plus_one=False))
