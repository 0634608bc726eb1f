"""Multilevel RoIAlign as pipelined Pallas TPU kernels (fwd + bwd).

Why: the hot op of two-stage detection. XLA's gather formulation pays
~8x sublane read amplification on the per-sample row gathers and lowers
the backward to scatter-adds (measured 11 ms fwd + 15 ms bwd per flagship
train step on v5e - tools/perf_probe_step.py); a naive per-roi Pallas loop
pays DMA latency per grid step (~145 us/roi). Here both directions stream
roi windows through VMEM with double-buffered async DMA and do all math in
layout-native shapes (no sublane<->lane relayouts inside the kernel):

Forward (grid over rois, 2-deep window pipeline):
  - all pyramid levels are packed side-by-side into one [B, Hp, Wtot*C]
    canvas (level x-offsets are static), so a roi window is a single
    strided HBM->VMEM copy [crop, crop_x*C] regardless of its FPN level,
    and the (W, C) flattening is a free trace-level reshape;
  - while roi r computes, roi r+1's window is already in flight;
  - y-interpolation is ONE MXU dot: [2P, crop] @ [crop, crop_x*C]
    (bilinear one-hot rows, sample-major), x-interpolation exploits the
    2-tap structure of bilinear weights: per x-sample, two 256-lane
    aligned dynamic slices blended on the VPU (reference ROIAlignV2
    semantics: 2x2 samples per bin, max/avg pooled,
    operator_cxx/contrib/roi_align_v2.cc);
  - the kernel emits the pooled output AND a {0,1} sample mask (which
    samples attain the bin max) so the backward never re-reads features.

Backward (grid over rois, multi-table read-modify-write pipeline):
  - feature gradients accumulate into `slots` canvas-shaped HBM tables
    (4 when VMEM allows, fewer under the scoped-VMEM budget — see the
    slot selection in _bwd) indexed by roi index mod slots; roi r's
    read of table r%slots only
    conflicts with roi (r-slots)'s write, so each write is waited on
    slots-1 grid steps after it is issued, giving the RMW DMA chain
    slots-1 grid steps of slack instead of a serial read->write->read
    dependency;
  - per roi, the output cotangent is pushed through the transposed
    2-tap x-blend (28 aligned lane-slice accumulations) and one MXU dot
    ([2P, crop]^T @ [2P, crop_x*C]) while the window round-trips; the
    two tables are then summed and sliced per level.

This replaces both the forward gathers and the backward scatter-adds with
contiguous window DMA at HBM-bandwidth rates.
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

# Mosaic scoped-VMEM stack model for the backward kernel (see _bwd):
# fixed slot-independent temporaries + `slots` window tables must stay
# under the 16 MB scoped limit with headroom. The 9.8 MB constant was
# calibrated from the compiler's accounting BEFORE dwin_scr became an
# explicit scratch (ADVICE r4); the fit check below still assumes
# min_slots=2 while the runtime default is now slots=1 (round 5), so the
# model over-reserves by one table (~1.6 MB at flagship shapes) — a
# conservative margin that more than covers the explicit dwin scratch,
# verified by compiling the flagship backward at batch 8/16/32 on chip.
_BWD_FIXED_VMEM = int(9.8 * 2 ** 20)
_VMEM_BUDGET = int(14.2 * 2 ** 20)


def bwd_vmem_fits(cw, c, tab_bytes, min_slots=2):
    """Can the backward run with at least `min_slots` gradient tables?"""
    return (_BWD_FIXED_VMEM + min_slots * cw * cw * c * tab_bytes
            <= _VMEM_BUDGET)


def _small_cw(cw):
    """Per-roi window size CLASSES for the multi-size DMA path, largest
    first (the static worst case `cw` is always class 0). 40 covers the
    canonical FPN footprint band's top (14-28 cells + bilinear tap +
    8-align slack); 32 catches footprints <= 23 cells — the lower half of
    the canonical band plus every sub-canonical roi — at (32/40)^2 = 0.64
    of the small class's DMA traffic. Returns () when the static window
    is already small. SIMPLEDET_ROI_SMALL_CW overrides as a
    comma-separated descending list ('0' disables; a single value
    restores the round-4 two-size behavior)."""
    import os
    v = os.environ.get("SIMPLEDET_ROI_SMALL_CW")
    if v is not None:
        sizes = tuple(int(x) for x in v.split(",") if int(x) > 0)
        sizes = tuple(s for s in sizes if s < cw)
        return tuple(sorted(sizes, reverse=True))
    return (40, 32) if cw >= 56 else ()


def _auto_crop(feats, strides, canonical_scale, canonical_level, p):
    longest = max(max(f.shape[1], f.shape[2]) * s
                  for f, s in zip(feats, strides))
    unclamped = 2.0 * canonical_scale / (2 ** canonical_level)
    crop = int(np.ceil(max(unclamped + 4, longest / strides[-1] + 2,
                           2 * p)))
    return -(-crop // 8) * 8


def _canvas_layout(shapes, crop, crop_x):
    """Static layout packing levels side-by-side along W.

    shapes: list of (H_i, W_i). Returns (hp, wtot, offs) where level i
    occupies rows [0, H_i) and columns [offs[i], offs[i] + W_i) of a
    [hp, wtot] canvas. Slot widths leave >= 8 columns of slack so an
    8-aligned x0 window of crop_x columns never crosses into the next
    level; hp likewise carries >= 8 rows of slack past the finest level
    so a bottom-edge window origin can align down without dropping the
    last rows (window origins are clamped to the SLOT extents, not the
    feature extents — padding cells are zeros, and the bilinear weights
    never reference them). Coarser levels read inert padding rows.
    """
    hp = -(-(max(max(h for h, w in shapes), crop) + 8) // 8) * 8
    offs, x = [], 0
    for h, w in shapes:
        offs.append(x)
        x += -(-max(w + 8, crop_x) // 8) * 8
    return hp, x, offs


def _prep(feats, rois, strides, out_size, canonical_scale, canonical_level,
          crop, offs, hp, wtot, small_cw=0):
    """Trace-side math shared by fwd+bwd: canvas window origins, dense
    one-hot y-weights, and 2-tap x-interp (index, frac) pairs.

    feats: list of [B, H_i, W_i, C]; rois [B, R, 4]. Returns
    (img_idx [BR], y0 [BR], xgc0 [BR] canvas-global lane offset (in
    elements, x*C), wy [BR, 2P, crop] f32 sample-major, xl [BR, 2P] int32
    window-local left-tap column, fx [BR, 2P] f32 tap fraction,
    empty [BR, P, P], small [BR] int32 {0,1}).

    small_cw > 0 enables the two-size window: rois whose full bilinear
    support fits in a [small_cw, small_cw] sub-window (origin clamped per
    size class) get small=1; the kernels then DMA only that sub-window —
    the y-weights/x-taps are zero outside the support, so stale VMEM
    content beyond the sub-window never reaches the output and results
    are bit-exact vs the single-size kernel. FPN's canonical assignment
    puts the typical roi footprint at 14-28 cells, while the static
    worst-case window must cover the coarsest level's full-image roi
    (~44 cells) — per-roi sizing cuts the dominant RMW DMA traffic to
    (small_cw/cw)^2 for the bulk of rois.
    """
    p = out_size
    b, r_per = rois.shape[:2]
    c = feats[0].shape[-1]
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
    ys = hstart[:, :, None] + (hend - hstart)[:, :, None] * fr
    xs = wstart[:, :, None] + (wend - wstart)[:, :, None] * fr
    ys = jnp.clip(ys, 0.0, hmax[..., None])               # [BR, P, 2]
    xs = jnp.clip(xs, 0.0, wmax[..., None])
    # sample-major rows: row s*P + bin
    ys2 = jnp.swapaxes(ys, 1, 2).reshape(-1, 2 * p)       # [BR, 2P]
    xs2 = jnp.swapaxes(xs, 1, 2).reshape(-1, 2 * p)

    # DMA offsets must be 8-aligned in both the flat canvas's sublane (H)
    # dim and the pre-flatten W dim; align down and widen the window by 8
    # to compensate. Both window dims end up crop + 8 (= cw). Origins are
    # clamped to h/w - cw pre-alignment so windows stay inside the canvas.
    cw = crop + 8
    # origins are clamped to the canvas SLOT extents (slot widths/hp carry
    # >= 8 cells of zero-padded slack, _canvas_layout), never the feature
    # extents: clamping to w - cw and then aligning down can drop up to 7
    # right/bottom-edge cells for a wide roi whose support ends at the
    # feature edge — samples themselves stay within the real cells (xs/ys
    # are clipped to w-1/h-1 above), padding is only ever DMA ballast
    slot_w = jnp.asarray(
        [nxt - off for off, nxt in zip(offs, list(offs[1:]) + [wtot])],
        jnp.int32)[lvl_idx]

    def origin(vals2, extent, size):
        v0 = jnp.clip(jnp.floor(jnp.min(vals2, 1)).astype(jnp.int32), 0,
                      jnp.maximum(extent - size, 0))
        return (v0 // 8) * 8

    y0 = origin(ys2, hp, cw)
    x0 = origin(xs2, slot_w, cw)
    # per-size origin clamp: near-edge rois clamp differently for each
    # sub-window size; a roi joins class k only if its full support fits
    # that size FROM the size-clamped origin (the +1 covers the bilinear
    # right tap). Sizes descend, so later (smaller) classes override.
    small = jnp.zeros(ys2.shape[0], jnp.int32)
    for code, sz in enumerate(small_cw or (), start=1):
        y0s = origin(ys2, hp, sz)
        x0s = origin(xs2, slot_w, sz)
        fits = ((jnp.max(ys2, 1) - y0s.astype(rois.dtype) <= sz - 1)
                & (jnp.max(xs2, 1) - x0s.astype(rois.dtype) <= sz - 1))
        small = jnp.where(fits, code, small)
        y0 = jnp.where(fits, y0s, y0)
        x0 = jnp.where(fits, x0s, x0)
    rel_y = jnp.clip(ys2 - y0[:, None].astype(rois.dtype), 0.0, cw - 1.0)
    rel_x = jnp.clip(xs2 - x0[:, None].astype(rois.dtype), 0.0,
                     cw - 1.0)

    def weights(rel, size):
        lo = jnp.floor(rel)
        frac = rel - lo
        return (jax.nn.one_hot(lo.astype(jnp.int32), size)
                * (1.0 - frac[..., None])
                + jax.nn.one_hot(jnp.minimum(lo + 1, size - 1)
                                 .astype(jnp.int32), size)
                * frac[..., None]).astype(jnp.float32)

    wy = weights(rel_y, size=cw)                          # [BR, 2P, cw]
    # 2-tap x-interp: clamp the left tap to size-2 so tap pairs are always
    # (xl, xl+1); rel == size-1 then yields frac 1.0, which reproduces the
    # one-hot min(lo+1, size-1) edge semantics exactly.
    xl = jnp.clip(jnp.floor(rel_x), 0, cw - 2).astype(jnp.int32)
    fx = (rel_x - xl.astype(rois.dtype)).astype(jnp.float32)
    # xl/fx become [BR, 1, 2P]: they enter the kernels as per-roi
    # PIPELINED SMEM blocks ([1, 1, 2P] per grid step), not scalar
    # prefetch — the whole pair is ~1.8 MB at batch 32 x 512 rois, which
    # overflowed the 1 MB scalar-prefetch SMEM cap (the round-4 batch-32
    # compile failure); a per-step block is 2P ints regardless of batch.
    # (Rank 3 because Mosaic requires a block's last two dims to equal the
    # array dims or be 8/128-divisible — (1, 2P) over [BR, 2P] is not.)
    xl = xl[:, None, :]
    fx = fx[:, None, :]
    img_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), r_per)
    xgc0 = (x0 + jnp.asarray(offs, jnp.int32)[lvl_idx]) * c
    return img_idx, y0, xgc0, wy, xl, fx, empty, small


def _fwd_kernel(img_ref, y0_ref, xgc_ref, canvas, wy_ref, xl_ref, fx_ref,
                out_ref, mask_ref, win, tmp_scr, sems, *, crop,
                crop_x, c, p, br, mode, scw):
    r = pl.program_id(0)
    # img_ref packs (small << 20) | img_idx (one scalar-prefetch array
    # instead of two); xl/fx arrive as per-roi [1, 2P] SMEM blocks

    def dma(slot, idx, size):
        return pltpu.make_async_copy(
            canvas.at[img_ref[idx] & 0xFFFFF,
                      pl.ds(pl.multiple_of(y0_ref[idx], 8), size),
                      pl.ds(pl.multiple_of(xgc_ref[idx], 8 * c),
                            size * c)],
            win.at[slot] if size == crop
            else win.at[slot, :size, :size * c],
            sems.at[slot])

    def sized_fwd(idx, fn):
        if not scw:
            fn(crop)
            return
        cls = img_ref[idx] >> 20
        for code, sz in enumerate((crop,) + tuple(scw)):
            @pl.when(cls == code)
            def _(sz=sz):
                fn(sz)

    def start(slot, idx):
        sized_fwd(idx, lambda sz: dma(slot, idx, sz).start())

    def wait(slot, idx):
        sized_fwd(idx, lambda sz: dma(slot, idx, sz).wait())

    @pl.when(r == 0)
    def _():
        if scw:
            # small windows leave rows/cols >= scw stale; the y-dot reads
            # the FULL window with zero weights there, and 0 * NaN = NaN —
            # so the scratch must start finite. Big windows overwrite it
            # all; small windows then see earlier finite feature values.
            win[...] = jnp.zeros((2, crop, crop_x * c), win.dtype)
        start(0, 0)

    @pl.when(r + 1 < br)
    def _():
        start((r + 1) % 2, r + 1)

    slot = jax.lax.rem(r, 2)
    wait(slot, r)
    w = win[slot]                                         # [crop, crop_x*C]
    wy = wy_ref[0].astype(w.dtype)                        # [2P, crop]
    # HIGHEST forces true-f32 MXU passes for f32 windows; bf16 operands
    # already accumulate in f32 and reject HIGHEST in Mosaic
    prec = (jax.lax.Precision.HIGHEST if w.dtype == jnp.float32
            else jax.lax.Precision.DEFAULT)
    tmp_scr[:] = jnp.dot(wy, w, preferred_element_type=jnp.float32,
                         precision=prec)

    for px in range(p):
        cols = []
        for sx in range(2):
            row = sx * p + px
            xlc = pl.multiple_of(xl_ref[0, 0, row] * c, c)
            a = tmp_scr[:, pl.ds(xlc, c)]                 # [2P, C] left tap
            b_ = tmp_scr[:, pl.ds(xlc + c, c)]            # right tap
            f = fx_ref[0, 0, row]
            cols.append(a * (1.0 - f) + b_ * f)           # [2P, C]
        s00, s10 = cols[0][:p], cols[0][p:]               # [P, C] (sy, sx)
        s01, s11 = cols[1][:p], cols[1][p:]
        if mode == "max":
            m = jnp.maximum(jnp.maximum(s00, s01), jnp.maximum(s10, s11))
            out_ref[0, :, px, :] = m
            for sy, sx, s in ((0, 0, s00), (0, 1, s01), (1, 0, s10),
                              (1, 1, s11)):
                mask_ref[0, sy, sx, :, px, :] = (s >= m).astype(
                    mask_ref.dtype)
        else:
            out_ref[0, :, px, :] = 0.25 * (s00 + s01 + s10 + s11)
            for sy in range(2):
                for sx in range(2):
                    mask_ref[0, sy, sx, :, px, :] = jnp.ones(
                        (p, c), mask_ref.dtype)


def _bwd_kernel(img_ref, y0_ref, xgc_ref,
                tabs_in, g_ref, mask_ref, wy_ref, xl_ref, fx_ref,
                tabs_out, win, dtmp,
                dwin_scr, rsems, wsems, *, crop, crop_x, c, p, br, slots,
                scw):
    r = pl.program_id(0)
    # img_ref packs (small << 20) | img_idx; xl/fx are [1, 2P] SMEM
    # blocks — see _fwd_kernel

    def window(idx, size):
        s = jax.lax.rem(idx, slots)
        return tabs_out.at[s, img_ref[idx] & 0xFFFFF,
                           pl.ds(pl.multiple_of(y0_ref[idx], 8), size),
                           pl.ds(pl.multiple_of(xgc_ref[idx], 8 * c),
                                 size * c)]

    def rd(idx, size):
        s = jax.lax.rem(idx, slots)
        return pltpu.make_async_copy(
            window(idx, size),
            win.at[s] if size == crop else win.at[s, :size, :size * c],
            rsems.at[s])

    def wr(idx, size):
        s = jax.lax.rem(idx, slots)
        return pltpu.make_async_copy(
            win.at[s] if size == crop else win.at[s, :size, :size * c],
            window(idx, size), wsems.at[s])

    def sized(idx, fn):
        """Run fn(size) with the DMA size matching roi idx's class. The
        small paths round-trip only the sub-window; rows/cols beyond stay
        stale in VMEM but are never written back (dwin is zero there)."""
        if not scw:
            fn(crop)
            return
        cls = img_ref[idx] >> 20
        for code, sz in enumerate((crop,) + tuple(scw)):
            @pl.when(cls == code)
            def _(sz=sz):
                fn(sz)

    @pl.when(r == 0)
    def _():
        sized(0, lambda sz: rd(0, sz).start())

    # dwin depends only on pipelined blocks: overlaps the in-flight read
    g = g_ref[0]                                          # [P, P, C] f32
    cnt = (mask_ref[0, 0, 0] + mask_ref[0, 0, 1] + mask_ref[0, 1, 0]
           + mask_ref[0, 1, 1]).astype(jnp.float32)
    ginv = g / jnp.maximum(cnt, 1.0)
    dtmp[:] = jnp.zeros((2 * p, crop_x * c), jnp.float32)
    for px in range(p):
        for sx in range(2):
            row = sx * p + px
            gsel = jnp.concatenate(
                [ginv[:, px, :] * mask_ref[0, sy, sx, :, px, :].astype(
                    jnp.float32) for sy in range(2)], axis=0)  # [2P, C]
            f = fx_ref[0, 0, row]
            xlc = pl.multiple_of(xl_ref[0, 0, row] * c, c)
            dtmp[:, pl.ds(xlc, c)] = (dtmp[:, pl.ds(xlc, c)]
                                      + gsel * (1.0 - f))
            dtmp[:, pl.ds(xlc + c, c)] = (dtmp[:, pl.ds(xlc + c, c)]
                                          + gsel * f)

    # [2P, sz]^T @ [2P, sz*C] -> [sz, sz*C], sized to the roi's window
    # class (the small branch runs a quarter of the MACs). This dot was
    # 16.5 of the backward's 30 ms at f32-HIGHEST (6-pass MXU with a
    # K=14 contraction); when the gradient tables are bf16 the operands
    # are cast to bf16 for a single-pass dot — the product is rounded to
    # bf16 by the table RMW anyway, so no precision is lost end-to-end.
    # f32 tables (SIMPLEDET_ROI_GRAD_F32 / f32 features) keep the
    # HIGHEST-precision dot.
    dot_dt = jnp.bfloat16 if win.dtype == jnp.bfloat16 else jnp.float32
    prec = (jax.lax.Precision.HIGHEST if dot_dt == jnp.float32
            else jax.lax.Precision.DEFAULT)

    def dwin_into(sz):
        d = jax.lax.dot_general(
            wy_ref[0][:, :sz].astype(dot_dt),
            dtmp[:, :sz * c].astype(dot_dt),
            dimension_numbers=(((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=prec)
        if sz == crop:
            dwin_scr[...] = d
        else:
            dwin_scr[:sz, :sz * c] = d

    sized(r, dwin_into)

    slot = jax.lax.rem(r, slots)
    sized(r, lambda sz: rd(r, sz).wait())

    def accumulate(sz):
        if sz == crop:
            win[slot] = (win[slot].astype(jnp.float32)
                         + dwin_scr[...]).astype(win.dtype)
        else:
            win[slot, :sz, :sz * c] = (
                win[slot, :sz, :sz * c].astype(jnp.float32)
                + dwin_scr[:sz, :sz * c]).astype(win.dtype)

    sized(r, accumulate)
    sized(r, lambda sz: wr(r, sz).start())

    # rd(r+1) writes win slot (r+1) % slots, which wr(r+1-slots) is still
    # copying out, and reads table (r+1) % slots, which the same write
    # targets — so that one write must land first. With `slots` tables the
    # wait is slots-1 steps behind the write, giving the RMW DMA chain
    # slots-1 grid steps of slack instead of the serial rd->wr->rd chain.
    @pl.when(r >= slots - 1)
    def _():
        sized(r - (slots - 1), lambda sz: wr(r - (slots - 1), sz).wait())

    @pl.when(r + 1 < br)
    def _():
        sized(r + 1, lambda sz: rd(r + 1, sz).start())

    @pl.when(r == br - 1)
    def _():
        # drain every write not yet waited on (the last min(slots-1, br))
        for j in range(min(slots - 1, br)):
            sized(br - 1 - j, lambda sz, j=j: wr(br - 1 - j, sz).wait())


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
    cw = crop + 8                   # window size in both dims (8-aligned)
    scw = _small_cw(cw)
    shapes = [(f.shape[1], f.shape[2]) for f in feats]
    hp, wtot, offs = _canvas_layout(shapes, cw, cw)
    img_idx, y0, xgc0, wy, xl, fx, empty, small = _prep(
        feats, rois, strides, p, canonical_scale, canonical_level, crop,
        offs, hp, wtot, small_cw=scw)
    canvas = jnp.concatenate(
        [jnp.pad(f, ((0, 0), (0, hp - f.shape[1]),
                     (0, off_next - off - f.shape[2]), (0, 0)))
         for f, off, off_next in zip(feats, offs, offs[1:] + [wtot])],
        axis=2).reshape(b, hp, wtot * c)
    br = b * r_per

    img_code = img_idx + (small << 20)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(br,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # canvas in HBM
            pl.BlockSpec((1, 2 * p, cw), lambda r, *s: (r, 0, 0)),
            pl.BlockSpec((1, 1, 2 * p), lambda r, *s: (r, 0, 0),
                         memory_space=pltpu.SMEM),        # xl
            pl.BlockSpec((1, 1, 2 * p), lambda r, *s: (r, 0, 0),
                         memory_space=pltpu.SMEM),        # fx
        ],
        out_specs=[
            pl.BlockSpec((1, p, p, c), lambda r, *s: (r, 0, 0, 0)),
            pl.BlockSpec((1, 2, 2, p, p, c),
                         lambda r, *s: (r, 0, 0, 0, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, cw, cw * c), feats[0].dtype),
            pltpu.VMEM((2 * p, cw * c), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out, mask = pl.pallas_call(
        functools.partial(_fwd_kernel, crop=cw, crop_x=cw, c=c, p=p,
                          br=br, mode=mode, scw=scw),
        grid_spec=grid_spec,
        out_shape=[jax.ShapeDtypeStruct((br, p, p, c), jnp.float32),
                   jax.ShapeDtypeStruct((br, 2, 2, p, p, c), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(img_code, y0, xgc0, canvas, wy, xl, fx)

    out = jnp.where(empty[..., None], 0.0, out).astype(feats[0].dtype)
    out = out.reshape(b, r_per, p, p, c)
    # zero-size skeletons carry per-level (H, W) + dtype through the
    # residual pytree without keeping feature values alive
    skels = [jnp.zeros((0,) + f.shape[1:], f.dtype) for f in feats]
    res = (rois, img_idx, y0, xgc0, wy, xl, fx, empty, mask, small, skels)
    return out, res


def _bwd(strides, out_size, canonical_scale, canonical_level, mode, crop,
         interpret, res, g):
    (rois, img_idx, y0, xgc0, wy, xl, fx, empty, mask, small, skels) = res
    p = out_size
    b = rois.shape[0]
    br = img_idx.shape[0]
    c = mask.shape[-1]
    shapes = [(s.shape[1], s.shape[2]) for s in skels]
    dtype = skels[0].dtype
    cw = wy.shape[-1]               # window size in both dims (crop + 8)
    scw = _small_cw(cw)
    hp, wtot, offs = _canvas_layout(shapes, cw, cw)

    g = g.reshape(br, p, p, c).astype(jnp.float32)
    g = jnp.where(empty[..., None], 0.0, g)
    # Accumulate straight in the feature dtype: for bf16 features the final
    # canvas is cast to bf16 anyway, so f32 tables only change the rounding
    # of per-window accumulation (few overlapping rois per cell) while
    # doubling the RMW DMA traffic — the dominant cost of this kernel.
    # SIMPLEDET_ROI_GRAD_F32=1 forces f32 tables when many overlapping
    # windows per cell (coarse levels, huge roi counts) make repeated bf16
    # read-modify-write rounding a concern; tests/test_roi_align.py bounds
    # the bf16-table error against f32 accumulation at flagship roi counts.
    import os
    f32_tables = os.environ.get("SIMPLEDET_ROI_GRAD_F32") == "1"
    tab_dt = (dtype if dtype == jnp.bfloat16 and not f32_tables
              else jnp.float32)
    # VMEM stack budget: Mosaic stacks ~9.8 MB of slot-independent kernel
    # temporaries (dtmp, the [cw, cw*c] dot output + f32 casts, pipelined
    # (g, mask, wy) blocks, scalar prefetch) on top of the `slots` window
    # tables — calibrated from the compiler's own accounting at flagship
    # shapes: 4 f32 tables (6.55 MB) reported 16.27 MB total, right AT the
    # 16 MB scoped-vmem limit (batch 2 fit by <300 KB; batch 4's larger
    # scalar-prefetch arrays tipped it into a stack overflow). Pick the
    # deepest RMW pipeline that keeps total under ~14.2 MB: bf16 tables
    # keep slots=4, f32 drop to 2. SIMPLEDET_ROI_BWD_SLOTS overrides.
    t_bytes = cw * cw * c * (2 if tab_dt == jnp.bfloat16 else 4)
    slots = int(os.environ.get("SIMPLEDET_ROI_BWD_SLOTS", "0"))
    if not slots:
        # ONE table: round-4 slot sweeps (1/2/4) showed the RMW pipeline
        # slack buys nothing — the per-roi dwin compute already covers the
        # DMA round-trip — while every extra slot costs a full
        # canvas-sized zero-init (broadcast, ~1.7 ms/GiB) plus a
        # cross-slot reduce (2.6 ms at flagship batch 8). Measured round
        # 5: slots=1 takes the b8 step 152.2 -> 147.2 ms (52.6 -> 54.3
        # img/s). SIMPLEDET_ROI_BWD_SLOTS restores deeper pipelines.
        slots = 1
    tabs0 = jnp.zeros((slots, b, hp, wtot * c), tab_dt)

    img_code = img_idx + (small << 20)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(br,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # grad tables
            pl.BlockSpec((1, p, p, c), lambda r, *s: (r, 0, 0, 0)),
            pl.BlockSpec((1, 2, 2, p, p, c),
                         lambda r, *s: (r, 0, 0, 0, 0, 0)),
            pl.BlockSpec((1, 2 * p, cw), lambda r, *s: (r, 0, 0)),
            pl.BlockSpec((1, 1, 2 * p), lambda r, *s: (r, 0, 0),
                         memory_space=pltpu.SMEM),        # xl
            pl.BlockSpec((1, 1, 2 * p), lambda r, *s: (r, 0, 0),
                         memory_space=pltpu.SMEM),        # fx
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((slots, cw, cw * c), tab_dt),
            pltpu.VMEM((2 * p, cw * c), jnp.float32),
            pltpu.VMEM((cw, cw * c), jnp.float32),   # dwin (branch-shared)
            pltpu.SemaphoreType.DMA((slots,)),
            pltpu.SemaphoreType.DMA((slots,)),
        ],
    )
    tabs = pl.pallas_call(
        functools.partial(_bwd_kernel, crop=cw, crop_x=cw, c=c, p=p,
                          br=br, slots=slots, scw=scw),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((slots, b, hp, wtot * c), tab_dt),
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(img_code, y0, xgc0, tabs0, g, mask, wy, xl, fx)

    gc = jnp.sum(tabs.astype(jnp.float32), axis=0).reshape(b, hp, wtot, c)
    gfeats = [gc[:, :h, off:off + w, :].astype(dtype)
              for (h, w), off in zip(shapes, offs)]
    return gfeats, jnp.zeros_like(rois)


batched_roi_align_pallas.defvjp(_fwd, _bwd)
