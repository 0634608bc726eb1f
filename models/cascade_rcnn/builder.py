"""Compat shim: the reference's `models.cascade_rcnn.builder` import surface
(reference models/cascade_rcnn/builder.py), backed by simpledet_tpu."""
from simpledet_tpu.dsl import (  # noqa: F401
    CascadeRcnn,
    CascadeBbox2fcHead,
    MSRAResNet50V1FPN,
    MSRAResNet101V1FPN,
    FPNNeck,
    FPNRpnHead,
    FPNRoiAlign,
)
