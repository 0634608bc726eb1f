"""Compat shim: the reference's `models.retinanet.builder` import surface,
backed by simpledet_tpu (reference models/retinanet/builder.py)."""
from simpledet_tpu.dsl import (  # noqa: F401
    RetinaNet,
    RetinaNetHead,
    RetinaNetHeadWithBN,
    RetinaNetNeck,
    RetinaNetNeckWithBN,
    MSRAResNet50V1FPN,
    MSRAResNet101V1FPN,
    ResNet50V1bFPN,
    ResNet101V1bFPN,
    ResNet152V1bFPN,
)
from simpledet_tpu.dsl import ResNet50V1bFPN as MSRAResNetV1bFPN  # noqa: F401,E402
