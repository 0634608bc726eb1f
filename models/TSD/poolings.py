"""Compat shim: reference models/TSD/poolings.py, backed by simpledet_tpu."""
from simpledet_tpu.dsl import (  # noqa: F401
    FPNRoIAlign_DeltaC,
    FPNRoIAlign_DeltaR,
)
from simpledet_tpu.targets.fpn_assign import fpn_roi_level as fpn_roi_assign_offset  # noqa: F401,E501
