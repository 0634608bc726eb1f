"""Compat shim: the reference's `models.RepPoints.builder` import surface
(reference models/RepPoints/builder.py), backed by simpledet_tpu."""
from simpledet_tpu.dsl import (  # noqa: F401
    RepPointsDetector,
    RepPointsHead,
    RetinaNetNeck,
    FCOSFPNNeck,
    MSRAResNet50V1FPN,
    MSRAResNet101V1FPN,
)
