"""Compat shim: reference models/maskrcnn/input.py transform classes,
backed by simpledet_tpu.data.mask_transforms."""
from simpledet_tpu.data.mask_transforms import (  # noqa: F401
    EncodeGtPoly,
    Flip2DImageBboxMask,
    Pad2DImageBboxMask,
    PreprocessGtPoly,
    Resize2DImageBboxMask,
)
from simpledet_tpu.data.transforms import Norm2DImage  # noqa: F401
