"""Compat shim: the reference's `models.FPG.builder` import surface
(reference models/FPG/builder.py), backed by simpledet_tpu."""
from simpledet_tpu.dsl import (  # noqa: F401
    FPGNeck,
    FPGNeckP2P6,
    PAFPNNeck,
    PAFPNNeckP2P6,
    PAFPNNeckP3P7,
)
