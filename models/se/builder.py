"""Compat shim: the reference's `models.se.builder` import surface
(reference models/se/builder.py), backed by simpledet_tpu."""
from simpledet_tpu.models.se import (  # noqa: F401
    SEBottleneck as se_resnet_v1b_unit,
    SEModule,
)
from simpledet_tpu.dsl import (  # noqa: F401
    MaskRcnnSe4convHead,
    hybrid_resnet_builder,
    hybrid_resnet_c4_builder,
    hybrid_resnet_fpn_builder,
)

SEResNetC4 = hybrid_resnet_c4_builder(se_resnet_v1b_unit)
SEResNetFPN = hybrid_resnet_fpn_builder(se_resnet_v1b_unit)
