"""FPN RoI-to-level assignment (mxnext.tvm.fpn_roi_assign analog).

Standard FPN paper rule used by the reference (models/FPN/builder.py:573-575
with roi_canonical_scale=224, roi_canonical_level=4,
config/faster_r50v1_fpn_1x.py:108-109):

    level = floor(canonical_level + log2(sqrt(w*h) / canonical_scale))

clamped to the available levels. Padded rois (all-zero) are assigned to the
lowest level; their features are zeroed downstream by the weight/label masks.
"""
import jax.numpy as jnp


def fpn_roi_level(rois, *, canonical_scale=224, canonical_level=4,
                  min_level=2, max_level=5, legacy_plus_one=True):
    """rois: [..., N, 4] -> int32 level index [..., N] in [min_level, max_level]."""
    off = 1.0 if legacy_plus_one else 0.0
    w = rois[..., 2] - rois[..., 0] + off
    h = rois[..., 3] - rois[..., 1] + off
    scale = jnp.sqrt(jnp.maximum(w * h, 1e-6))
    lvl = jnp.floor(canonical_level + jnp.log2(scale / canonical_scale + 1e-12))
    return jnp.clip(lvl, min_level, max_level).astype(jnp.int32)
