"""Compat shim: the reference's `models.dcn.builder` import surface
(reference models/dcn/builder.py), backed by simpledet_tpu."""
from simpledet_tpu.models.dcn import DCNBottleneck as dcn_resnet_unit  # noqa: F401
from simpledet_tpu.models.dcn import DeformConv  # noqa: F401
from simpledet_tpu.dsl import (  # noqa: F401
    hybrid_resnet_builder,
    hybrid_resnet_c4_builder,
    hybrid_resnet_fpn_builder,
)

DCNResNetC4 = hybrid_resnet_c4_builder(dcn_resnet_unit)
DCNResNetFPN = hybrid_resnet_fpn_builder(dcn_resnet_unit)

from simpledet_tpu.models.dcn import DCNv2Bottleneck as dcnv2_resnet_unit  # noqa: F401,E402
from simpledet_tpu.models.dcn import C4StrideKeyAdapter  # noqa: E402

DCNv2ResNetC4 = hybrid_resnet_c4_builder(dcnv2_resnet_unit)
DCNv2ResNetFPN = hybrid_resnet_fpn_builder(dcnv2_resnet_unit)


def _c4_stride16(cls):
    """Wrap a hybrid C4 backbone so its module also emits 'stride16'."""
    class _Wrapped(cls):
        def __init__(self, pBackbone):
            super().__init__(pBackbone)
            self.module = C4StrideKeyAdapter(inner=self.module)
    _Wrapped.__name__ = cls.__name__ + "Stride16"
    return _Wrapped


DCNResNetC4S16 = _c4_stride16(DCNResNetC4)
DCNv2ResNetC4S16 = _c4_stride16(DCNv2ResNetC4)
