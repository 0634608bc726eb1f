"""Compat shim: the reference's `symbol.builder` import surface
(reference symbol/builder.py public classes), backed by simpledet_tpu.dsl."""
from simpledet_tpu.dsl import (  # noqa: F401
    FasterRcnn,
    RPN,
    Bbox2fcHead,
    Neck,
    RoiAlign,
    add_anchor_to_arg,
)
