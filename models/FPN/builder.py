"""Compat shim: the reference's `models.FPN.builder` import surface
(reference models/FPN/builder.py public classes), backed by simpledet_tpu.dsl."""
from simpledet_tpu.dsl import (  # noqa: F401
    MSRAResNet50V1FPN,
    MSRAResNet101V1FPN,
    ResNet50V1bFPN,
    ResNet101V1bFPN,
    ResNet152V1bFPN,
    ResNet50V1dFPN,
    FPNNeck,
    FPNRpnHead,
    FPNRoiAlign,
    FPNBbox2fcHead,
    FPNBboxDualHeadSmall,
)
from simpledet_tpu.dsl import (  # noqa: F401,E402
    Bbox1conv2fcHead,
    Bbox4conv1fcHead,
    ResNeXt50FPN,
    ResNeXt101FPN,
)
