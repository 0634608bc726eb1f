"""Compat shim: reference models/tridentnet/input.py. Scale-aware ranges and
trident anchor targets run on-device (simpledet_tpu/models/tridentnet.py)."""
from simpledet_tpu.data.transforms import DetectionAugmentation


class ScaleAwareRange(DetectionAugmentation):
    def __init__(self, pScaleRange=None):
        self.p = pScaleRange

    def apply(self, record):
        return record


class TridentAnchorTarget2D(DetectionAugmentation):
    def __init__(self, pAnchor=None):
        self.p = pAnchor

    def apply(self, record):
        return record
