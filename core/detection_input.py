"""Compat shim: reference core/detection_input.py transform classes,
backed by simpledet_tpu.data.transforms (host pipeline is NHWC; anchor
targets run on-device so AnchorTarget2D-style transforms are not needed in
configs with in-graph targets)."""
from simpledet_tpu.data.transforms import (  # noqa: F401
    ConvertImageFromHwcToChw,
    DetectionAugmentation,
    Flip2DImageBbox,
    Norm2DImage,
    Pad2DImageBbox,
    RandResize2DImageBbox,
    ReadRoiRecord,
    RenameRecord,
    Resize2DImageBbox,
)
from simpledet_tpu.data.loader import Loader  # noqa: F401
from simpledet_tpu.data.transforms import (  # noqa: F401,E402
    Pad2DImage,
    RandCrop2DImageBbox,
    Resize2DImage,
    Resize2DImageByRoidb,
)
