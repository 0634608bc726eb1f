"""Compat shim: the reference's `models.efficientnet.builder` import surface
(reference models/efficientnet/builder.py), backed by simpledet_tpu."""
from simpledet_tpu.dsl import (  # noqa: F401
    EfficientNetB4FPN,
    EfficientNetB5FPN,
    EfficientNetB6FPN,
    EfficientNetB7FPN,
    efficientnet_fpn_builder,
)
from simpledet_tpu.models.efficientnet import EfficientNet, MBConv  # noqa: F401
from simpledet_tpu.models.se import SEModule as se  # noqa: F401
