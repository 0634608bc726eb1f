"""RoIAlign on TPU — gather + bilinear interpolation, autodiff backward.

Exact semantics of the reference ROIAlign_v2 (operator_cxx/contrib/
roi_align_v2-inl.h:61-154): per output bin, the roi is split into
out_size x out_size bins (coords scaled by spatial_scale, bin clipped to
[0, dim-1]); each bin is sampled at the 2x2 grid of (1/3, 2/3) fractional
positions, each sample bilinearly interpolated with edge clamping, and the
bin value is the MAX of the 4 samples (avg mode also provided — Detectron
convention). Empty bins (hend <= hstart after clipping) output 0.

The backward pass is free via JAX autodiff (gather -> scatter-add), replacing
the reference's atomic-add CUDA backward (roi_align_v2.cu:79-82).

multilevel_roi_align fuses FPN level assignment into a single flat gather:
instead of running RoIAlign per level and summing zeroed rows
(models/FPN/builder.py:588-605), all level feature maps are flattened and
concatenated once and each roi gathers from its assigned level's slice —
4x less gather traffic on the identical result.
"""
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from simpledet_tpu.targets.fpn_assign import fpn_roi_level


def _bilinear_flat(feat_flat, width, y, x, hw_valid):
    """Bilinear sample from flattened [H*W (+...), C] features.

    y, x: [...] float sample coords already offset into the flat index space
    is handled by caller via row offset; here y/x are local coords and
    `hw_valid` gives (h, w) bounds per sample for clamping.
    """
    h_max = hw_valid[0] - 1
    w_max = hw_valid[1] - 1
    yl = jnp.clip(jnp.floor(y), 0, h_max)
    yh = jnp.clip(jnp.ceil(y), 0, h_max)
    xl = jnp.clip(jnp.floor(x), 0, w_max)
    xh = jnp.clip(jnp.ceil(x), 0, w_max)
    alpha = jnp.where(yh > yl, y - yl, 0.5)
    beta = jnp.where(xh > xl, x - xl, 0.5)
    yl, yh, xl, xh = (v.astype(jnp.int32) for v in (yl, yh, xl, xh))

    def take(yy, xx):
        return feat_flat[yy * width + xx]

    v = ((1 - alpha)[..., None] * (1 - beta)[..., None] * take(yl, xl)
         + alpha[..., None] * (1 - beta)[..., None] * take(yh, xl)
         + (1 - alpha)[..., None] * beta[..., None] * take(yl, xh)
         + alpha[..., None] * beta[..., None] * take(yh, xh))
    return v


def roi_align(feat, rois, *, spatial_scale, out_size, mode="max"):
    """Single image. feat: [H, W, C]; rois: [R, 4] (x1,y1,x2,y2, image coords).

    Returns [R, out_size, out_size, C].
    """
    h, w, c = feat.shape
    return _roi_align_flat(
        feat.reshape(h * w, c), rois,
        row_offset=jnp.zeros((rois.shape[0],), jnp.int32),
        height=jnp.full((rois.shape[0],), h), width_arr=jnp.full((rois.shape[0],), w),
        flat_width=w, spatial_scale=jnp.full((rois.shape[0],), spatial_scale,
                                             feat.dtype),
        out_size=out_size, mode=mode)


def _roi_align_flat(feat_flat, rois, *, row_offset, height, width_arr,
                    flat_width, spatial_scale, out_size, mode,
                    bin_offset=None, trans_std=0.1):
    """Core: gather-based RoIAlign against a flattened feature tensor.

    feat_flat: [sum(H_i*W_i), C]. Per-roi: row_offset (start row of its level
    in units of flat rows / flat_width), height/width_arr (its level's dims),
    spatial_scale (its level's 1/stride). flat_width must be the width used
    to flatten every level slice (levels are padded to a common width).
    """
    r = rois.shape[0]
    scale = spatial_scale[:, None]                       # [R, 1]
    x1 = rois[:, 0:1] * scale
    y1 = rois[:, 1:2] * scale
    x2 = rois[:, 2:3] * scale
    y2 = rois[:, 3:4] * scale
    bin_h = (y2 - y1) / out_size                          # [R, 1]
    bin_w = (x2 - x1) / out_size

    grid = jnp.arange(out_size, dtype=rois.dtype)
    hmax = (height - 1).astype(rois.dtype)[:, None]
    wmax = (width_arr - 1).astype(rois.dtype)[:, None]
    hstart = jnp.clip(y1 + grid[None, :] * bin_h, 0.0, hmax)   # [R, P]
    hend = jnp.clip(y1 + (grid[None, :] + 1) * bin_h, 0.0, hmax)
    wstart = jnp.clip(x1 + grid[None, :] * bin_w, 0.0, wmax)
    wend = jnp.clip(x1 + (grid[None, :] + 1) * bin_w, 0.0, wmax)
    empty_h = hend <= hstart                              # [R, P]
    empty_w = wend <= wstart

    # 2 sample positions per axis at 1/3 and 2/3 of the clipped bin
    fr = jnp.asarray([1.0 / 3.0, 2.0 / 3.0], rois.dtype)
    ys = hstart[:, :, None] + (hend - hstart)[:, :, None] * fr  # [R, P, 2]
    xs = wstart[:, :, None] + (wend - wstart)[:, :, None] * fr

    # broadcast to [R, P, P, 2, 2]
    y = ys[:, :, None, :, None] + jnp.zeros((1, 1, out_size, 1, 2), rois.dtype)
    x = xs[:, None, :, None, :] + jnp.zeros((1, out_size, 1, 2, 1), rois.dtype)
    if bin_offset is not None:
        # per-bin (dx, dy) in units of roi size * trans_std (the reference's
        # DeformablePSROIPooling trans semantics, models/TSD/poolings.py)
        roi_h = (y2 - y1)                                   # [R, 1]
        roi_w = (x2 - x1)
        dy = bin_offset[..., 1] * trans_std * roi_h[:, :, None]
        dx = bin_offset[..., 0] * trans_std * roi_w[:, :, None]
        y = y + dy[:, :, :, None, None]
        x = x + dx[:, :, :, None, None]

    hb = height[:, None, None, None, None] - 1
    wb = width_arr[:, None, None, None, None] - 1
    yl = jnp.clip(jnp.floor(y), 0, hb)
    yh = jnp.clip(jnp.ceil(y), 0, hb)
    xl = jnp.clip(jnp.floor(x), 0, wb)
    xh = jnp.clip(jnp.ceil(x), 0, wb)
    alpha = jnp.where(yh > yl, y - yl, 0.5)
    beta = jnp.where(xh > xl, x - xl, 0.5)
    yl, yh, xl, xh = (v.astype(jnp.int32) for v in (yl, yh, xl, xh))
    base = row_offset[:, None, None, None, None]

    def take(yy, xx):
        idx = base + yy * flat_width + xx                # [R, P, P, 2, 2]
        return feat_flat[idx]                            # [..., C]

    val = ((1 - alpha)[..., None] * (1 - beta)[..., None] * take(yl, xl)
           + alpha[..., None] * (1 - beta)[..., None] * take(yh, xl)
           + (1 - alpha)[..., None] * beta[..., None] * take(yl, xh)
           + alpha[..., None] * beta[..., None] * take(yh, xh))

    if mode == "max":
        out = jnp.max(val, axis=(3, 4))                  # [R, P, P, C]
    else:
        out = jnp.mean(val, axis=(3, 4))
    empty = (empty_h[:, :, None] | empty_w[:, None, :])  # [R, P, P]
    return jnp.where(empty[..., None], 0.0, out)


def multilevel_roi_align_gather(feats, rois, strides, *, out_size,
                                canonical_scale=224, canonical_level=4,
                                mode="max", bin_offset=None, trans_std=0.1):
    """Gather-based multilevel RoIAlign (reference implementation; kept as
    the semantics oracle — XLA serializes large row gathers on TPU, see
    multilevel_roi_align below for the production crop-based path)."""
    import math
    min_level = int(math.log2(strides[0]))
    max_level = int(math.log2(strides[-1]))
    level = fpn_roi_level(rois, canonical_scale=canonical_scale,
                          canonical_level=canonical_level,
                          min_level=min_level, max_level=max_level)
    lvl_idx = level - min_level                           # [R] in [0, L)

    c = feats[0].shape[-1]
    flat_width = max(f.shape[1] for f in feats)
    padded = [jnp.pad(f, ((0, 0), (0, flat_width - f.shape[1]), (0, 0)))
              for f in feats]
    flat = jnp.concatenate([p.reshape(-1, c) for p in padded], axis=0)

    row_offsets, heights, widths, scales = [], [], [], []
    acc = 0
    for f, s in zip(feats, strides):
        row_offsets.append(acc)
        heights.append(f.shape[0])
        widths.append(f.shape[1])
        scales.append(1.0 / s)
        acc += f.shape[0] * flat_width
    row_offsets = jnp.asarray(row_offsets, jnp.int32)[lvl_idx]
    heights = jnp.asarray(heights, jnp.int32)[lvl_idx]
    widths = jnp.asarray(widths, jnp.int32)[lvl_idx]
    scales = jnp.asarray(scales, rois.dtype)[lvl_idx]

    return _roi_align_flat(flat, rois, row_offset=row_offsets, height=heights,
                           width_arr=widths, flat_width=flat_width,
                           spatial_scale=scales, out_size=out_size, mode=mode,
                           bin_offset=bin_offset, trans_std=trans_std)


def multilevel_roi_align(feats, rois, strides, *, out_size,
                         canonical_scale=224, canonical_level=4, mode="max",
                         bin_offset=None, trans_std=0.1, crop=None):
    """Single-image wrapper over batched_multilevel_roi_align.

    NOTE: do NOT jax.vmap this over a batch — vmapping the internal
    dynamic_slice lowers to a full-feature-map gather/select (OOM at
    flagship shapes). Call batched_multilevel_roi_align instead.
    """
    if bin_offset is not None:
        # deformable (per-bin offset) pooling: gather path (TSD only — two
        # small pools per step)
        return multilevel_roi_align_gather(
            feats, rois, strides, out_size=out_size,
            canonical_scale=canonical_scale, canonical_level=canonical_level,
            mode=mode, bin_offset=bin_offset, trans_std=trans_std)
    out = batched_multilevel_roi_align(
        [f[None] for f in feats], rois[None], strides, out_size=out_size,
        canonical_scale=canonical_scale, canonical_level=canonical_level,
        mode=mode, crop=crop)
    return out[0]


def _default_impl(feats, strides, out_size, canonical_scale,
                  canonical_level, crop):
    """Pick the RoIAlign impl at trace time: the pallas window kernel on
    TPU when its (static) VMEM scratch fits, else the gather formulation.
    """
    from simpledet_tpu.utils.platform import is_tpu
    if not is_tpu():
        return "gather"
    try:
        from simpledet_tpu.kernels import roi_align_pallas as rap
        if rap.pltpu is None:
            return "gather"
        if crop is None:
            crop = rap._auto_crop(feats, strides, canonical_scale,
                                  canonical_level, out_size)
    except Exception:
        return "gather"
    cw = crop + 8
    c = feats[0].shape[-1]
    # backward kernel is the VMEM high-water mark; use the calibrated
    # Mosaic stack model (fixed temporaries + >=2 gradient tables under
    # the 16 MB scoped limit — roi_align_pallas.bwd_vmem_fits). Table
    # dtype matches what _bwd will actually allocate: bf16 features use
    # bf16 tables UNLESS SIMPLEDET_ROI_GRAD_F32=1 forces f32 accumulation
    # (roi_align_pallas.py _bwd tab_dt) — sizing with the wrong dtype here
    # could pick pallas and then fail Mosaic scoped-VMEM compilation.
    import os
    import jax.numpy as jnp
    f32_tables = os.environ.get("SIMPLEDET_ROI_GRAD_F32") == "1"
    tab_bytes = 2 if (feats[0].dtype == jnp.bfloat16 and not f32_tables) \
        else 4
    return "pallas" if rap.bwd_vmem_fits(cw, c, tab_bytes) else "gather"


def batched_multilevel_roi_align(feats, rois, strides, *, out_size,
                                 canonical_scale=224, canonical_level=4,
                                 mode="max", crop=None, impl=None):
    """Batched multilevel RoIAlign dispatcher.

    impl: "pallas" (pipelined per-roi window-DMA kernel — the TPU default
    whenever its VMEM scratch fits), "gather" (XLA gather formulation —
    semantics oracle and the fallback everywhere else), "crop" (scan +
    dynamic_slice + MXU einsum — portable, but scan iteration overhead
    dominates at large roi counts). Override with SIMPLEDET_ROI_ALIGN.

    Measured on v5e inside the full bf16 flagship train step
    (tools/perf_bf16.py): the canvas-packed double-buffered pallas kernel
    takes the step from 101 ms to 84 ms (19.8 -> 23.7 img/s) by replacing
    ~11 ms of sublane-amplified row gathers (fwd) and ~15 ms of
    scatter-adds (bwd) with contiguous window DMA. Standalone microbenches
    over the TPU tunnel are dominated by per-dispatch round-trips and
    cannot rank these impls — only in-step timing can. The gather path
    stays the default on CPU and for single-level (C4) extractors whose
    worst-case crop window exceeds VMEM.
    """
    import os
    # resolve the crop override BEFORE impl selection: _default_impl sizes
    # the pallas backward's VMEM fit from the actual crop, so a forced
    # larger crop must be visible to that check or it can select 'pallas'
    # and then fail Mosaic scoped-VMEM compilation
    if crop is None and os.environ.get("SIMPLEDET_ROI_CROP"):
        crop = int(os.environ["SIMPLEDET_ROI_CROP"])
    impl = impl or os.environ.get("SIMPLEDET_ROI_ALIGN") \
        or _default_impl(feats, strides, out_size, canonical_scale,
                         canonical_level, crop)
    if impl == "crop":
        return _batched_crop_roi_align(
            feats, rois, strides, out_size=out_size,
            canonical_scale=canonical_scale,
            canonical_level=canonical_level, mode=mode, crop=crop)
    if impl == "pallas":
        from simpledet_tpu.kernels.roi_align_pallas import \
            batched_roi_align_pallas
        return batched_roi_align_pallas(
            feats, rois, strides, out_size=out_size,
            canonical_scale=canonical_scale,
            canonical_level=canonical_level, mode=mode, crop=crop)
    fn = lambda *a: multilevel_roi_align_gather(
        list(a[:-1]), a[-1], strides, out_size=out_size,
        canonical_scale=canonical_scale, canonical_level=canonical_level,
        mode=mode)
    return jax.vmap(fn)(*feats, rois)


def _batched_crop_roi_align(feats, rois, strides, *, out_size,
                            canonical_scale=224, canonical_level=4,
                            mode="max", crop=None):
    """FPN RoI extraction — crop + MXU interpolation, batched.

    feats: list of [B, H_i, W_i, C] per level (fine -> coarse);
    rois: [B, R, 4]. Returns [B, R, out_size, out_size, C].

    TPU note: XLA lowers large generic gathers to a serial per-index loop
    (measured ~500ms for the 100k-row gather a 512-roi RoIAlign needs), so
    instead each roi dynamic_slices a fixed crop x crop window from its
    (image, level) and interpolates with per-axis one-hot bilinear weight
    matrices via einsum on the MXU — zero gathers, contiguous backward
    (dynamic_update_slice accumulation). The scan runs over ALL (image, roi)
    pairs; never vmap it. The crop covers every roi the FPN assignment rule
    produces at standard shapes; parity vs the gather oracle is asserted in
    tests/test_roi_align.py.
    """
    import math
    p = out_size
    b, r_per = rois.shape[:2]
    rois = rois.reshape(b * r_per, 4)
    batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r_per)
    r = rois.shape[0]
    c = feats[0].shape[-1]
    n_level = len(feats)
    min_level = int(math.log2(strides[0]))
    max_level = int(math.log2(strides[-1]))
    level = fpn_roi_level(rois, canonical_scale=canonical_scale,
                          canonical_level=canonical_level,
                          min_level=min_level, max_level=max_level)
    lvl_idx = level - min_level                           # [R]

    if crop is None:
        # A roi assigned (unclamped) to level l satisfies
        # canonical*2^(l-canonical_level) <= sqrt(area) < 2x that, so spans
        # < 2*canonical/2^canonical_level cells at its level. Clamped rois at
        # the coarsest level span up to longest_side/max_stride cells.
        longest = max(max(f.shape[1], f.shape[2]) * s
                      for f, s in zip(feats, strides))
        unclamped = 2.0 * canonical_scale / (2 ** canonical_level)
        crop = int(np.ceil(max(unclamped + 4,
                               longest / strides[-1] + 2, 2 * p)))
        crop = -(-crop // 8) * 8                          # sublane align

    # Long-side-aware level clamp: area-based assignment lets extreme-aspect
    # rois (e.g. 550x30) span hundreds of cells on the long side at a fine
    # level. Such rois move up to the coarsest level whose cell span fits the
    # crop — a deliberate deviation from the reference's pure-area rule,
    # affecting only aspect ratios beyond ~(crop/28):1 (the oracle gather
    # path keeps the pure rule for parity testing).
    long_px = jnp.maximum(rois[:, 2] - rois[:, 0], rois[:, 3] - rois[:, 1])
    fit = crop - 4.0
    needed = jnp.ceil(jnp.log2(jnp.maximum(long_px / (fit * strides[0]),
                                           1e-6)))
    needed = jnp.clip(needed, 0, n_level - 1).astype(jnp.int32)
    lvl_idx = jnp.maximum(lvl_idx, needed)

    heights = jnp.asarray([f.shape[1] for f in feats], jnp.int32)[lvl_idx]
    widths = jnp.asarray([f.shape[2] for f in feats], jnp.int32)[lvl_idx]
    scales = jnp.asarray([1.0 / s for s in strides], rois.dtype)[lvl_idx]

    # ---- absolute sample coords in level-cell space (reference semantics:
    # bins clipped to [0, dim-1], 2 samples per axis at 1/3 and 2/3) -------
    scale = scales[:, None]
    x1 = rois[:, 0:1] * scale
    y1 = rois[:, 1:2] * scale
    x2 = rois[:, 2:3] * scale
    y2 = rois[:, 3:4] * scale
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
             | (wend <= wstart)[:, None, :])              # [R, P, P]

    fr = jnp.asarray([1.0 / 3.0, 2.0 / 3.0], rois.dtype)
    ys = hstart[:, :, None] + (hend - hstart)[:, :, None] * fr  # [R, P, 2]
    xs = wstart[:, :, None] + (wend - wstart)[:, :, None] * fr

    ys = jnp.clip(ys, 0.0, hmax[..., None]).reshape(r, p * 2)
    xs = jnp.clip(xs, 0.0, wmax[..., None]).reshape(r, p * 2)

    # ---- crop window origin (always inside the level's valid region) -----
    y0 = jnp.clip(jnp.floor(jnp.min(ys, 1)).astype(jnp.int32), 0,
                  jnp.maximum(heights - crop, 0))
    x0 = jnp.clip(jnp.floor(jnp.min(xs, 1)).astype(jnp.int32), 0,
                  jnp.maximum(widths - crop, 0))
    rel_y = jnp.clip(ys - y0[:, None].astype(rois.dtype), 0.0, crop - 1.0)
    rel_x = jnp.clip(xs - x0[:, None].astype(rois.dtype), 0.0, crop - 1.0)

    def weights(rel):
        lo = jnp.floor(rel)
        frac = rel - lo
        w = (jax.nn.one_hot(lo.astype(jnp.int32), crop) * (1.0 - frac[..., None])
             + jax.nn.one_hot(jnp.minimum(lo + 1, crop - 1).astype(jnp.int32),
                              crop) * frac[..., None])
        return w                                          # [R, P*2, crop]

    wy = weights(rel_y)
    wx = weights(rel_x)

    # pad each level so the static crop always fits
    padded = [jnp.pad(f, ((0, 0), (0, max(crop - f.shape[1], 0)),
                          (0, max(crop - f.shape[2], 0)), (0, 0)))
              for f in feats]

    def one_roi(carry, inp):
        bi, lv, yy, xx, wyr, wxr = inp

        def slice_level(i):
            return lambda: jax.lax.dynamic_slice(
                padded[i], (bi, yy, xx, 0), (1, crop, crop, c))[0]

        window = jax.lax.switch(lv, [slice_level(i) for i in range(n_level)])
        window = window.astype(jnp.float32)
        tmp = jnp.einsum("ph,hwc->pwc", wyr, window,
                         preferred_element_type=jnp.float32)
        out = jnp.einsum("qw,pwc->pqc", wxr, tmp,
                         preferred_element_type=jnp.float32)
        return carry, out                                 # [P*2, P*2, C]

    _, samples = jax.lax.scan(one_roi, 0,
                              (batch_idx, lvl_idx, y0, x0, wy, wx))
    samples = samples.reshape(r, p, 2, p, 2, c)
    if mode == "max":
        out = jnp.max(samples, axis=(2, 4))
    else:
        out = jnp.mean(samples, axis=(2, 4))
    out = jnp.where(empty[..., None], 0.0, out).astype(feats[0].dtype)
    return out.reshape(b, r_per, p, p, c)


def roi_pool(feat, rois, *, spatial_scale, out_size, samples=4):
    """Legacy max RoIPooling (reference roi_pooling_v1{-inl.h,.cc,.cu}):
    integer bin boundaries, max over each bin — realized as a dense
    samples x samples nearest-neighbor max per bin (gather-based, static
    cost; exact when samples covers the bin). RoIAlign is the production
    path; this exists for parity. feat [H, W, C]; rois [R, 4] ->
    [R, P, P, C]."""
    h, w, _ = feat.shape
    p = out_size
    x1 = jnp.round(rois[:, 0:1] * spatial_scale)
    y1 = jnp.round(rois[:, 1:2] * spatial_scale)
    x2 = jnp.round(rois[:, 2:3] * spatial_scale)
    y2 = jnp.round(rois[:, 3:4] * spatial_scale)
    rw = jnp.maximum(x2 - x1 + 1.0, 1.0)
    rh = jnp.maximum(y2 - y1 + 1.0, 1.0)

    grid = (jnp.arange(p * samples, dtype=feat.dtype) + 0.5) / samples
    ys = y1 + grid[None, :] * rh / p                       # [R, P*S]
    xs = x1 + grid[None, :] * rw / p
    yi = jnp.clip(jnp.floor(ys), 0, h - 1).astype(jnp.int32)
    xi = jnp.clip(jnp.floor(xs), 0, w - 1).astype(jnp.int32)

    def per_roi(yr, xr):
        vals = feat[yr[:, None], xr[None, :]]              # [P*S, P*S, C]
        v = vals.reshape(p, samples, p, samples, -1)
        return jnp.max(v, axis=(1, 3))

    return jax.vmap(per_roi)(yi, xi)
