"""Compat shim: reference operator_py/nms.py wrappers, backed by the
device NMS kernels (simpledet_tpu.ops.nms)."""
import numpy as np
import jax.numpy as jnp

from simpledet_tpu.ops.nms import (  # noqa: F401
    nms as _nms,
    set_nms as _set_nms,
    soft_nms as _soft_nms,
    py_weighted_nms as _py_weighted_nms,
)


def py_nms_wrapper(thresh):
    def _do(dets):
        dets = np.asarray(dets, np.float32)
        boxes, scores, idx, valid = _nms(
            jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]),
            thresh, len(dets))
        keep = np.asarray(idx)[np.asarray(valid)]
        return keep.tolist()
    return _do


def cython_soft_nms_wrapper(thresh, sigma=0.5, score_thresh=0.001,
                            method="gaussian"):
    def _do(dets):
        dets = np.asarray(dets, np.float32)
        boxes, scores, idx, valid = _soft_nms(
            jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]), len(dets),
            thr=thresh, sigma=sigma, score_thresh=score_thresh,
            method=method)
        v = np.asarray(valid)
        out = np.concatenate([np.asarray(boxes)[v],
                              np.asarray(scores)[v][:, None]], 1)
        return out
    return _do


def set_nms(dets, thresh):
    dets = np.asarray(dets, np.float32)
    boxes, scores, idx, valid = _set_nms(
        jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]),
        jnp.asarray(dets[:, 5]), thresh, len(dets))
    keep = np.asarray(idx)[np.asarray(valid)]
    return dets[keep]


def py_weighted_nms(dets, thresh_lo, thresh_hi):
    dets = np.asarray(dets, np.float32)
    boxes, scores, idx, valid = _py_weighted_nms(
        jnp.asarray(dets[:, :4]), jnp.asarray(dets[:, 4]), thresh_lo,
        thresh_hi, len(dets))
    v = np.asarray(valid)
    return np.concatenate([np.asarray(boxes)[v],
                           np.asarray(scores)[v][:, None]], 1)
