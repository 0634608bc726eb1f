"""Deformable convolution v1/v2 — gather + bilinear sampling + MXU matmul.

TPU rewrite of mx.sym.contrib.DeformableConvolution (used by
models/dcn/builder.py:15, RepPoints and TSD heads in the reference): the
deformable im2col CUDA kernel becomes a vectorized bilinear gather producing
[H, W, K*K, C] sampled patches, contracted with the kernel on the MXU via
einsum. Backward is free through JAX autodiff (gather -> scatter-add,
replacing the reference's atomic-add backward kernels).

Offset layout matches MXNet: [..., 2*G*K*K] channels ordered
(group, tap, {y, x}); sampling outside the input is zero (bilinear with
zero padding), per the deformable-conv paper. v2 modulation multiplies each
tap's sample by a sigmoid mask [..., G*K*K].
"""
import jax
import jax.numpy as jnp
import numpy as np


def _bilinear_sample_zero(img, y, x):
    """img [H, W, C]; y/x [...]. Bilinear sample with zeros outside."""
    h, w, _ = img.shape
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    wy = y - y0
    wx = x - x0

    def tap(yy, xx):
        inside = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        yi = jnp.clip(yy, 0, h - 1).astype(jnp.int32)
        xi = jnp.clip(xx, 0, w - 1).astype(jnp.int32)
        v = img[yi, xi]
        return jnp.where(inside[..., None], v, 0.0)

    return ((1 - wy)[..., None] * (1 - wx)[..., None] * tap(y0, x0)
            + wy[..., None] * (1 - wx)[..., None] * tap(y0 + 1, x0)
            + (1 - wy)[..., None] * wx[..., None] * tap(y0, x0 + 1)
            + wy[..., None] * wx[..., None] * tap(y0 + 1, x0 + 1))


def deform_conv2d(x, offset, weight, *, stride=1, dilation=1, padding=None,
                  num_deformable_group=1, mask=None, bias=None):
    """Single image. x: [H, W, C]; offset: [H', W', 2*G*K*K];
    weight: [K, K, C, F]; mask (v2): [H', W', G*K*K] (pre-sigmoid no — give
    post-sigmoid values). Returns [H', W', F].

    H' = out height for the given stride/padding (offset spatial dims must
    match the output, as in MXNet where the offset conv shares stride).
    """
    kh, kw, c, f = weight.shape
    kk = kh * kw
    g = num_deformable_group
    pad = (dilation * (kh - 1)) // 2 if padding is None else padding
    oh, ow = offset.shape[:2]

    # base grid: out position -> input anchor
    oy = jnp.arange(oh, dtype=x.dtype) * stride - pad
    ox = jnp.arange(ow, dtype=x.dtype) * stride - pad
    ky = jnp.arange(kh, dtype=x.dtype) * dilation
    kx = jnp.arange(kw, dtype=x.dtype) * dilation
    kyg, kxg = jnp.meshgrid(ky, kx, indexing="ij")      # [kh, kw]
    base_y = jnp.broadcast_to(
        oy[:, None, None] + kyg.reshape(-1)[None, None, :], (oh, ow, kk))
    base_x = jnp.broadcast_to(
        ox[None, :, None] + kxg.reshape(-1)[None, None, :], (oh, ow, kk))

    off = offset.reshape(oh, ow, g, kk, 2)
    y = base_y[:, :, None, :] + off[..., 0]             # [H', W', G, KK]
    xx = base_x[:, :, None, :] + off[..., 1]

    cg = c // g
    xg = x.reshape(x.shape[0], x.shape[1], g, cg)
    # sample per group: [H', W', G, KK, C/G]
    samp = jax.vmap(
        lambda img, yy, xs: _bilinear_sample_zero(img, yy, xs),
        in_axes=(2, 2, 2), out_axes=2)(xg, y, xx)
    if mask is not None:
        samp = samp * mask.reshape(oh, ow, g, kk)[..., None]
    samp = jnp.moveaxis(samp, 3, 2).reshape(oh, ow, kk, c)  # [H',W',KK,C]

    w2 = weight.reshape(kk, c, f)
    out = jnp.einsum("hwkc,kcf->hwf", samp, w2,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    if bias is not None:
        out = out + bias
    return out


def batched_deform_conv2d(x, offset, weight, **kw):
    """vmapped over the batch axis."""
    mask = kw.pop("mask", None)
    if mask is not None:
        return jax.vmap(lambda a, o, m: deform_conv2d(
            a, o, weight, mask=m, **kw))(x, offset, mask)
    return jax.vmap(lambda a, o: deform_conv2d(a, o, weight, **kw))(x, offset)
