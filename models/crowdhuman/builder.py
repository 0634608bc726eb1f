"""Compat shim: the reference's `models.crowdhuman.builder` import surface
(reference models/crowdhuman/builder.py), backed by simpledet_tpu."""
from simpledet_tpu.dsl import (  # noqa: F401
    DoublePredRcnn,
    DoublePredFPNBbox2fcHead,
    FPNRpnHeadwithIgnore,
    MSRAResNet50V1FPN,
    FPNNeck,
    FPNRpnHead,
    FPNRoiAlign,
)
from simpledet_tpu.models.crowdhuman import emd_loss  # noqa: F401
