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
