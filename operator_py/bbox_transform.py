"""Compat shim: reference operator_py/bbox_transform.py, backed by
simpledet_tpu.ops.bbox (jnp; accepts numpy arrays)."""
import numpy as np
import jax.numpy as jnp

from simpledet_tpu.ops.bbox import BBOX_XFORM_CLIP  # noqa: F401
from simpledet_tpu.ops.bbox import bbox_overlaps as _iou
from simpledet_tpu.ops.bbox import clip_boxes as _clip
from simpledet_tpu.ops.bbox import decode_boxes as _decode
from simpledet_tpu.ops.bbox import encode_boxes as _encode
from simpledet_tpu.ops.bbox import flip_boxes as _flip


def bbox_overlaps_py(boxes, query):
    return np.asarray(_iou(jnp.asarray(boxes, jnp.float32),
                           jnp.asarray(query, jnp.float32)))


def nonlinear_transform(ex_rois, gt_rois):
    return np.asarray(_encode(jnp.asarray(ex_rois, jnp.float32),
                              jnp.asarray(gt_rois, jnp.float32)))


def nonlinear_pred(boxes, deltas):
    return np.asarray(_decode(jnp.asarray(boxes, jnp.float32),
                              jnp.asarray(deltas, jnp.float32)))


def clip_boxes(boxes, im_shape):
    # reference im_shape is (h, w)
    return np.asarray(_clip(jnp.asarray(boxes, jnp.float32),
                            jnp.asarray(im_shape[:2], jnp.float32)))


def flip_boxes(boxes, im_width):
    return np.asarray(_flip(jnp.asarray(boxes, jnp.float32), im_width))
