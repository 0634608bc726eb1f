"""Compat shim: reference models/retinanet/input.py. Dense anchor targets
run on-device (simpledet_tpu/targets/retina_target.py); the transforms are
no-op passthroughs kept for config compatibility."""
from simpledet_tpu.data.transforms import (  # noqa: F401
    DetectionAugmentation,
    Norm2DImage,
)


class PyramidAnchorTarget2D(DetectionAugmentation):
    def __init__(self, pAnchor=None):
        self.p = pAnchor

    def apply(self, record):
        return record


class AverageFgCount(DetectionAugmentation):
    """No-op: fg-count normalization is computed in-graph over the global
    sharded batch (reference models/retinanet/input.py:202-210)."""

    def __init__(self, name=None):
        self.name = name

    def apply(self, batch):
        return batch
