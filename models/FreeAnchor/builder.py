"""Compat shim: the reference's `models.FreeAnchor.builder` import surface
(reference models/FreeAnchor/builder.py), backed by simpledet_tpu."""
from simpledet_tpu.dsl import (  # noqa: F401
    FreeAnchorRetinaNetHead,
    RetinaNet,
    RetinaNetNeck,
    MSRAResNet50V1FPN,
    MSRAResNet101V1FPN,
)
