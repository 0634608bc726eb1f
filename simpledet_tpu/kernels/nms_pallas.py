"""Greedy NMS as a Pallas TPU kernel.

Replaces the reference's CUDA bitmask NMS (operator_cxx/contrib/proposal.cu
nms_kernel:263 / nms.cu) on the device hot path. The lax.scan fallback in
ops/nms.py issues N sequential HLO loop steps; this kernel keeps the whole
problem VMEM-resident and runs the greedy scan as one fori_loop with O(N)
VPU vector work per step — no per-step dispatch, boxes/IoU rows stay
on-chip.

Layout: boxes are pre-sorted by descending score (the caller sorts). The
kernel computes, per row i, the IoU of box i against ALL boxes as an [8, N]
vector op (sublane-broadcast), ORs the suppression row into the running
mask for j > i when box i survives, and records keep[i].

N must be a multiple of 128 (caller pads); VMEM use is ~N*4*4 bytes for
boxes + a few [8, N] masks, fine up to N = 16k.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None


def _nms_kernel(boxes_ref, keep_ref, *, thr, n, legacy_plus_one):
    # boxes_ref: [N, 8] rows (x1, y1, x2, y2, valid, pad...) — the valid
    # flag rides in the box tensor so every pallas operand keeps 2D blocks
    # whose trailing dims equal the array dims (vmap batching then only adds
    # a leading grid dimension, which Mosaic supports).
    off = 1.0 if legacy_plus_one else 0.0
    x1 = boxes_ref[:, 0].reshape(1, n)
    y1 = boxes_ref[:, 1].reshape(1, n)
    x2 = boxes_ref[:, 2].reshape(1, n)
    y2 = boxes_ref[:, 3].reshape(1, n)
    area = (x2 - x1 + off) * (y2 - y1 + off)
    valid = boxes_ref[:, 4].reshape(1, n)
    col = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

    def body(i, state):
        suppressed, keep = state
        # gather row i's box as scalars
        bx1 = boxes_ref[i, 0]
        by1 = boxes_ref[i, 1]
        bx2 = boxes_ref[i, 2]
        by2 = boxes_ref[i, 3]
        barea = (bx2 - bx1 + off) * (by2 - by1 + off)
        iw = jnp.minimum(bx2, x2) - jnp.maximum(bx1, x1) + off
        ih = jnp.minimum(by2, y2) - jnp.maximum(by1, y1) + off
        inter = jnp.maximum(iw, 0.0) * jnp.maximum(ih, 0.0)
        iou = inter / jnp.maximum(area + barea - inter, 1e-12)

        sup_i = jnp.sum(jnp.where(col == i, suppressed, 0.0)) > 0.5
        val_i = jnp.sum(jnp.where(col == i, valid, 0.0)) > 0.5
        keep_i = jnp.logical_and(jnp.logical_not(sup_i), val_i)
        row = (iou > thr) & (col > i) & (valid > 0.5)
        suppressed = jnp.where(
            keep_i, jnp.maximum(suppressed, row.astype(jnp.float32)),
            suppressed)
        keep = jnp.where(col == i,
                         keep_i.astype(jnp.float32), keep)
        return suppressed, keep

    suppressed0 = jnp.zeros((1, n), jnp.float32)
    keep0 = jnp.zeros((1, n), jnp.float32)
    _, keep = jax.lax.fori_loop(0, n, body, (suppressed0, keep0))
    keep_ref[:, :] = keep.reshape(n // 128, 128)


@functools.partial(jax.jit,
                   static_argnames=("thr", "legacy_plus_one", "interpret"))
def nms_keep_sorted_pallas(sorted_boxes, sorted_valid, thr,
                           legacy_plus_one=True, interpret=False):
    """Pallas greedy-NMS keep mask. sorted_boxes [N, 4] (descending score),
    sorted_valid [N] bool -> keep [N] bool. N padded to a lane multiple."""
    n = sorted_boxes.shape[0]
    pad = (-n) % 128
    np_ = n + pad
    packed = jnp.zeros((np_, 8), jnp.float32)
    packed = packed.at[:n, :4].set(sorted_boxes.astype(jnp.float32))
    packed = packed.at[:n, 4].set(sorted_valid.astype(jnp.float32))

    keep = pl.pallas_call(
        functools.partial(_nms_kernel, thr=float(thr), n=np_,
                          legacy_plus_one=legacy_plus_one),
        out_shape=jax.ShapeDtypeStruct((np_ // 128, 128), jnp.float32),
        interpret=interpret,
    )(packed)
    return keep.reshape(np_)[:n] > 0.5


def pallas_available():
    from simpledet_tpu.utils.platform import is_tpu
    return is_tpu()
