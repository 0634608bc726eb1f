"""Compat shim: reference symbol/detector.py (older split-out detector
classes, superseded by symbol/builder.py)."""
from simpledet_tpu.dsl import FasterRcnn, RPN  # noqa: F401
