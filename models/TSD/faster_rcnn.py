"""Compat shim: reference models/TSD/faster_rcnn.py, backed by simpledet_tpu."""
from simpledet_tpu.dsl import TSDFasterRcnn  # noqa: F401
from simpledet_tpu.dsl import TSDFasterRcnn as FasterRcnn  # noqa: F401
