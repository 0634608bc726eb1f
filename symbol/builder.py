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
from simpledet_tpu.dsl import (  # noqa: F401,E402
    Bbox1conv2fcHead,
    Bbox4conv1fcHead,
    BboxC5Head,
    BboxC5V1Head,
    BboxResNeXtC5Head,
    MSRAResNet50V1C4,
    MSRAResNet101V1C4,
)

from simpledet_tpu.dsl import (  # noqa: F401,E402
    ReduceNeck,
    MXNetResNet50V2C4C5,
    MXNetResNet101V2C4C5,
)
