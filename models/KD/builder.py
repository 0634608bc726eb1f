"""Compat shim: the reference's `models.KD.builder` import surface
(reference models/KD/builder.py), backed by simpledet_tpu."""
from simpledet_tpu.dsl import (  # noqa: F401
    FitNetHead,
    FitNetFasterRcnn,
    FitNetRetinaNet,
)
