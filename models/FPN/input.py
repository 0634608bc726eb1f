"""Compat shim: reference models/FPN/input.py. PyramidAnchorTarget2D ran
anchor assignment in loader threads; here anchor targets are generated
on-device inside the jitted train step (simpledet_tpu/targets/
anchor_target.py), so the transform is a no-op passthrough kept for config
compatibility."""
from simpledet_tpu.data.transforms import DetectionAugmentation


class PyramidAnchorTarget2D(DetectionAugmentation):
    def __init__(self, pAnchor=None):
        self.p = pAnchor

    def apply(self, record):
        return record


AnchorTarget2D = PyramidAnchorTarget2D
