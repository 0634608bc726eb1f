"""Compat shim: the reference's `models.maskrcnn.builder` import surface
(reference models/maskrcnn/builder.py), backed by simpledet_tpu."""
from simpledet_tpu.dsl import (  # noqa: F401
    MaskFasterRcnn,
    MaskFPNRpnHead,
    MaskRpnHead,
    MaskFasterRcnn4ConvHead,
    BboxPostProcessor,
    MSRAResNet50V1FPN,
    MSRAResNet101V1FPN,
    FPNNeck,
    FPNRoiAlign,
    FPNBbox2fcHead,
)
