"""Compat shim: reference models/sepc/sepc_neck.py, backed by
simpledet_tpu.models.sepc."""
from simpledet_tpu.models.sepc import (  # noqa: F401
    IntegratedBN,
    PConvModule,
    SEPCFPN,
)
