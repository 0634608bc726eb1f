"""Multilevel RoIAlign as a Pallas TPU kernel (the hot op of two-stage
detection).

Why: XLA lowers the gather formulation to a serial per-index loop (~100ms
for 512 rois at flagship shapes) and a scan-of-dynamic_slice formulation
pays per-iteration dispatch. Here a grid runs over rois; the stacked level
features stay in HBM and each grid step DMAs only its roi's crop x crop
window into VMEM (async copy at element-granularity offsets from the
scalar-prefetched window coordinates), then interpolates with per-axis
bilinear weight matrices on the MXU:

  tmp    = Wy[r] @ window.reshape(crop, crop*C)
  out[r] = (Wx[r] @ tmp_p)_p                # batched over y-sample rows

The forward is wrapped in a custom VJP; the backward reuses the same
window math through XLA's scan-of-dynamic_update_slice (sequential,
race-free accumulation into the feature gradients).
"""
import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

try:
    from jax.experimental.pallas import tpu as pltpu
except ImportError:  # pragma: no cover
    pltpu = None

from simpledet_tpu.targets.fpn_assign import fpn_roi_level


def _auto_crop(feats, strides, canonical_scale, canonical_level, p):
    longest = max(max(f.shape[1], f.shape[2]) * s
                  for f, s in zip(feats, strides))
    unclamped = 2.0 * canonical_scale / (2 ** canonical_level)
    crop = int(np.ceil(max(unclamped + 4, longest / strides[-1] + 2,
                           2 * p)))
    return -(-crop // 8) * 8


def _prep(feats, rois, strides, out_size, canonical_scale, canonical_level,
          crop):
    """Trace-side math shared by fwd+bwd: window origins + weights.

    feats: list of [B, H_i, W_i, C]; rois [B, R, 4].
    """
    p = out_size
    b, r_per = rois.shape[:2]
    rois_f = rois.reshape(b * r_per, 4)
    n_level = len(feats)

    min_level = int(math.log2(strides[0]))
    max_level = int(math.log2(strides[-1]))
    level = fpn_roi_level(rois_f, canonical_scale=canonical_scale,
                          canonical_level=canonical_level,
                          min_level=min_level, max_level=max_level)
    lvl_idx = level - min_level

    # long-side-aware level clamp (see kernels/roi_align.py)
    long_px = jnp.maximum(rois_f[:, 2] - rois_f[:, 0],
                          rois_f[:, 3] - rois_f[:, 1])
    needed = jnp.ceil(jnp.log2(jnp.maximum(
        long_px / ((crop - 4.0) * strides[0]), 1e-6)))
    lvl_idx = jnp.maximum(lvl_idx,
                          jnp.clip(needed, 0, n_level - 1).astype(jnp.int32))

    heights = jnp.asarray([f.shape[1] for f in feats], jnp.int32)[lvl_idx]
    widths = jnp.asarray([f.shape[2] for f in feats], jnp.int32)[lvl_idx]
    scales = jnp.asarray([1.0 / s for s in strides], rois.dtype)[lvl_idx]

    scale = scales[:, None]
    x1 = rois_f[:, 0:1] * scale
    y1 = rois_f[:, 1:2] * scale
    x2 = rois_f[:, 2:3] * scale
    y2 = rois_f[:, 3:4] * scale
    bin_h = (y2 - y1) / p
    bin_w = (x2 - x1) / p
    grid = jnp.arange(p, dtype=rois.dtype)
    hmax = (heights - 1).astype(rois.dtype)[:, None]
    wmax = (widths - 1).astype(rois.dtype)[:, None]
    hstart = jnp.clip(y1 + grid[None, :] * bin_h, 0.0, hmax)
    hend = jnp.clip(y1 + (grid[None, :] + 1) * bin_h, 0.0, hmax)
    wstart = jnp.clip(x1 + grid[None, :] * bin_w, 0.0, wmax)
    wend = jnp.clip(x1 + (grid[None, :] + 1) * bin_w, 0.0, wmax)
    empty = ((hend <= hstart)[:, :, None]
             | (wend <= wstart)[:, None, :])              # [BR, P, P]

    fr = jnp.asarray([1.0 / 3.0, 2.0 / 3.0], rois.dtype)
    ys = (hstart[:, :, None]
          + (hend - hstart)[:, :, None] * fr).reshape(-1, p * 2)
    xs = (wstart[:, :, None]
          + (wend - wstart)[:, :, None] * fr).reshape(-1, p * 2)
    ys = jnp.clip(ys, 0.0, hmax)
    xs = jnp.clip(xs, 0.0, wmax)

    y0 = jnp.clip(jnp.floor(jnp.min(ys, 1)).astype(jnp.int32), 0,
                  jnp.maximum(heights - crop, 0))
    x0 = jnp.clip(jnp.floor(jnp.min(xs, 1)).astype(jnp.int32), 0,
                  jnp.maximum(widths - crop, 0))
    # DMA offsets in the second-minor (W) dim must be sublane-aligned (8);
    # align x0 down and widen the window by 8 to compensate
    x0 = (x0 // 8) * 8
    crop_x = crop + 8
    rel_y = jnp.clip(ys - y0[:, None].astype(rois.dtype), 0.0, crop - 1.0)
    rel_x = jnp.clip(xs - x0[:, None].astype(rois.dtype), 0.0,
                     crop_x - 1.0)

    def weights(rel, size):
        lo = jnp.floor(rel)
        frac = rel - lo
        return (jax.nn.one_hot(lo.astype(jnp.int32), size)
                * (1.0 - frac[..., None])
                + jax.nn.one_hot(jnp.minimum(lo + 1, size - 1)
                                 .astype(jnp.int32), size)
                * frac[..., None]).astype(jnp.float32)

    wy = weights(rel_y, crop)                             # [BR, P2, crop]
    wx = weights(rel_x, crop_x)                           # [BR, P2, crop+8]
    img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r_per)
    return img_idx, lvl_idx, y0, x0, wy, wx, empty


def _fwd_kernel(img_ref, lvl_ref, y0_ref, x0_ref, stacked_hbm, wy_ref,
                wx_ref, out_ref, win_scratch, sem, *, crop, crop_x, c, p2):
    r = pl.program_id(0)
    img = img_ref[r]
    lvl = lvl_ref[r]
    y0 = y0_ref[r]
    x0 = pl.multiple_of(x0_ref[r], 8)
    dma = pltpu.make_async_copy(
        stacked_hbm.at[img, lvl, pl.ds(y0, crop), pl.ds(x0, crop_x), :],
        win_scratch, sem)
    dma.start()
    dma.wait()
    window = win_scratch[:].astype(jnp.float32)           # [crop, crop_x, C]
    wy = wy_ref[0]                                        # [P2, crop]
    wx = wx_ref[0]                                        # [P2, crop_x]
    tmp = jnp.dot(wy, window.reshape(crop, crop_x * c),
                  preferred_element_type=jnp.float32)
    tmp = tmp.reshape(p2, crop_x, c)
    out = jax.lax.dot_general(
        wx, tmp, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)               # [P2(x), P2(y), C]
    out_ref[0] = jnp.swapaxes(out, 0, 1)


def _pallas_forward(stacked, img_idx, lvl_idx, y0, x0, wy, wx, *, crop,
                    crop_x, c, p2, interpret=False):
    br = wy.shape[0]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(br,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),          # stacked in HBM
            pl.BlockSpec((1, p2, crop), lambda r, *s: (r, 0, 0)),
            pl.BlockSpec((1, p2, crop_x), lambda r, *s: (r, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, p2, p2, c), lambda r, *s: (r, 0, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((crop, crop_x, c), stacked.dtype),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, crop=crop, crop_x=crop_x, c=c, p2=p2),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((br, p2, p2, c), jnp.float32),
        interpret=interpret,
    )(img_idx, lvl_idx, y0, x0, stacked, wy, wx)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6, 7, 8))
def batched_roi_align_pallas(feats, rois, strides, out_size=7,
                             canonical_scale=224, canonical_level=4,
                             mode="max", crop=None, interpret=False):
    """feats: list of [B, H_i, W_i, C]; rois [B, R, 4] ->
    [B, R, out_size, out_size, C]. Differentiable wrt feats (rois get zero
    cotangents — every caller samples/stop-gradients them)."""
    out, _ = _fwd(feats, rois, strides, out_size, canonical_scale,
                  canonical_level, mode, crop, interpret)
    return out


def _fwd(feats, rois, strides, out_size, canonical_scale, canonical_level,
         mode, crop, interpret):
    p = out_size
    b, r_per = rois.shape[:2]
    c = feats[0].shape[-1]
    if crop is None:
        crop = _auto_crop(feats, strides, canonical_scale, canonical_level,
                          p)
    img_idx, lvl_idx, y0, x0, wy, wx, empty = _prep(
        feats, rois, strides, p, canonical_scale, canonical_level, crop)
    crop_x = crop + 8
    hp = max(max(f.shape[1] for f in feats), crop)
    wp = max(max(f.shape[2] for f in feats), crop) + 8
    stacked = jnp.stack(
        [jnp.pad(f, ((0, 0), (0, hp - f.shape[1]), (0, wp - f.shape[2]),
                     (0, 0))) for f in feats], axis=1)
    br = b * r_per
    p2 = p * 2

    samples = _pallas_forward(stacked, img_idx, lvl_idx, y0, x0, wy, wx,
                              crop=crop, crop_x=crop_x, c=c, p2=p2,
                              interpret=interpret)
    samples = samples.reshape(br, p, 2, p, 2, c)
    if mode == "max":
        out = jnp.max(samples, axis=(2, 4))
        sel = (samples == jnp.max(samples, axis=(2, 4), keepdims=True))
        sel = sel.astype(jnp.float32)
        sel = sel / jnp.maximum(jnp.sum(sel, axis=(2, 4), keepdims=True),
                                1.0)
    else:
        out = jnp.mean(samples, axis=(2, 4))
        sel = jnp.full((br, p, 2, p, 2, c), 0.25, jnp.float32)
    out = jnp.where(empty[..., None], 0.0, out).astype(feats[0].dtype)
    out = out.reshape(b, r_per, p, p, c)
    # zero-size skeletons carry per-level (H, W) + dtype through the
    # residual pytree without keeping feature values alive
    skels = [jnp.zeros((0,) + f.shape[1:], f.dtype) for f in feats]
    res = (rois, img_idx, lvl_idx, y0, x0, wy, wx, empty, sel, skels)
    return out, res


def _bwd(strides, out_size, canonical_scale, canonical_level, mode, crop,
         interpret, res, g):
    (rois, img_idx, lvl_idx, y0, x0, wy, wx, empty, sel, skels) = res
    p = out_size
    b = rois.shape[0]
    br = img_idx.shape[0]
    c = sel.shape[-1]
    p2 = p * 2
    shapes = [(s.shape[1], s.shape[2]) for s in skels]
    dtype = skels[0].dtype
    n_level = len(shapes)
    crop = wy.shape[-1]
    crop_x = wx.shape[-1]
    hp = max(max(h for h, w in shapes), crop)
    wp = max(max(w for h, w in shapes), crop) + 8

    g = g.reshape(br, p, p, c).astype(jnp.float32)
    g = jnp.where(empty[..., None], 0.0, g)
    gs = (g[:, :, None, :, None, :] * sel).reshape(br, p2, p2, c)

    def one_roi(gacc, inp):
        img, lvl, yy, xx, gr, wyr, wxr = inp
        # dwindow = Wy^T @ (g contracted with Wx over x-samples)
        tmp = jax.lax.dot_general(
            gr, wxr, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)           # [P2, C, crop]
        tmp = jnp.swapaxes(tmp, 1, 2)                     # [P2, crop, C]
        dwin = jax.lax.dot_general(
            wyr, tmp.reshape(p2, crop_x * c),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).reshape(crop, crop_x, c)
        old = jax.lax.dynamic_slice(gacc, (img, lvl, yy, xx, 0),
                                    (1, 1, crop, crop_x, c))
        gacc = jax.lax.dynamic_update_slice(
            gacc, old + dwin[None, None], (img, lvl, yy, xx, 0))
        return gacc, None

    gacc = jnp.zeros((b, n_level, hp, wp, c), jnp.float32)
    gacc, _ = jax.lax.scan(one_roi, gacc,
                           (img_idx, lvl_idx, y0, x0, gs, wy, wx))
    gfeats = [gacc[:, i, :h, :w, :].astype(dtype)
              for i, (h, w) in enumerate(shapes)]
    return gfeats, jnp.zeros_like(rois)


batched_roi_align_pallas.defvjp(_fwd, _bwd)
