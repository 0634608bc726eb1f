"""Device-side image normalization (the TPU half of Norm2DImage).

The reference normalizes pixels on the host inside loader worker threads
(core/detection_input.py:48-66 Norm2DImage), which costs a float32
temporary + two full passes per image and forces float32 H2D transfers.
Here the host pipeline keeps pixels uint8 end-to-end (4x smaller copies,
collation and H2D) and the (x - mean) / std runs inside the jitted step,
where XLA fuses it into the first conv's input read for free.

Semantics notes vs the reference:
- mean/std subtraction commutes with bilinear resize (both affine), so
  normalizing after resize is mathematically identical; the only delta is
  uint8 rounding in cv2.resize (<= 0.5/255 per pixel).
- the reference pads AFTER normalizing, so padded pixels are exactly 0 in
  normalized space; uint8 zero-padding would normalize to -mean/std, so
  the padded border is re-zeroed here from im_info (fused elementwise).
"""
import jax.numpy as jnp


def device_normalize(data, im_info, mean, std):
    """data [B,H,W,3] uint8 (or already-normalized float — returned as is);
    im_info [B,3] = (h', w', scale) resized extents pre-padding.
    Returns float32 normalized data with the padded border zeroed."""
    if data.dtype != jnp.uint8:
        return data
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    x = (data.astype(jnp.float32) - mean) / std
    h, w = data.shape[1:3]
    row_ok = jnp.arange(h, dtype=jnp.float32)[None, :] < im_info[:, 0:1]
    col_ok = jnp.arange(w, dtype=jnp.float32)[None, :] < im_info[:, 1:2]
    mask = row_ok[:, :, None] & col_ok[:, None, :]
    return jnp.where(mask[..., None], x, 0.0)


def flip_valid_region(data, im_info):
    """Horizontally mirror each image's VALID region in place-of-copy.

    data: [B,H,W,3] numpy (uint8 or float), top-left-aligned content in a
    padded canvas; im_info: [B,3] = (h', w', scale).

    Flip-TTA must mirror only rows < h' and cols < w' so content stays
    top-left-aligned with im_info: device_normalize masks cols >= w'
    assuming top-left content, and the test CLI's un-flip box math is
    x -> w'-1-x within the valid region. Mirroring the whole canvas would
    right-align content — zeroing real pixels under the normalize mask and
    shifting coordinates by (canvas_W - w') whenever the canvas is wider
    than the resized image (reference flips unpadded images, so it never
    faced this: detection_test.py TTA + core/detection_input.py:184-206).
    """
    import numpy as np
    data = np.array(data)
    for b in range(data.shape[0]):
        h2 = int(round(float(im_info[b, 0])))
        w2 = int(round(float(im_info[b, 1])))
        data[b, :h2, :w2] = data[b, :h2, :w2][:, ::-1]
    return data


def find_pixel_norm(transforms):
    """Scan a config's transform chain for the (deferred) Norm2DImage and
    return (mean, std), or None if the chain normalizes on the host."""
    for t in transforms or ():
        if type(t).__name__ == "Norm2DImage" and getattr(t, "deferred", False):
            return t.mean, t.std
    return None
