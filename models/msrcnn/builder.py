"""Compat shim: the reference's `models.msrcnn.builder` import surface
(reference models/msrcnn/builder.py), backed by simpledet_tpu."""
from simpledet_tpu.dsl import (  # noqa: F401
    MaskScoringFasterRcnn,
    MaskIoUConvHead,
    MaskFPNRpnHead,
    MaskFasterRcnn4ConvHead,
    BboxPostProcessor,
    MSRAResNet50V1FPN,
    FPNNeck,
    FPNRoiAlign,
    FPNBbox2fcHead,
)
