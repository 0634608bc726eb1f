"""Compat shim: the reference's `models.FCOS.builder` import surface
(reference models/FCOS/builder.py), backed by simpledet_tpu."""
from simpledet_tpu.dsl import (  # noqa: F401
    FCOSDetector,
    FCOSFPNHead,
    FCOSFPNNeck,
    MSRAResNet50V1FPN,
    MSRAResNet101V1FPN,
)
