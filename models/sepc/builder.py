"""Compat shim: the reference's `models.sepc.builder` import surface
(reference models/sepc/builder.py), backed by simpledet_tpu."""
from simpledet_tpu.dsl import (  # noqa: F401
    RetinaNetNeckWithBNWithSEPC,
    RetinaNetHeadWithBNWithSEPC,
    RetinaNet,
    MSRAResNet50V1FPN,
    MSRAResNet101V1FPN,
)
