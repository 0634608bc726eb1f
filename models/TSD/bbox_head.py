"""Compat shim: reference models/TSD/bbox_head.py, backed by simpledet_tpu."""
from simpledet_tpu.dsl import TSDConvFCBBoxHead  # noqa: F401
from simpledet_tpu.models.tsd import (  # noqa: F401
    cls_pc_loss,
    reg_pc_loss,
    tsd_reg_target,
)
