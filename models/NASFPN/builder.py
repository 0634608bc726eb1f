"""Compat shim: the reference's `models.NASFPN.builder` import surface
(reference models/NASFPN/builder.py), backed by simpledet_tpu."""
from simpledet_tpu.dsl import (  # noqa: F401
    NASFPNNeck,
    TopDownBottomUpFPNNeck,
    RetinaNetHeadWithBN,
    RetinaNet,
    MSRAResNet50V1FPN,
    MSRAResNet101V1FPN,
)
from simpledet_tpu.models.nasfpn import merge_gp  # noqa: F401
