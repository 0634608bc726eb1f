"""Compat shim: the reference's `models.tridentnet.builder` import surface
(reference models/tridentnet/builder.py), backed by simpledet_tpu."""
from simpledet_tpu.dsl import (  # noqa: F401
    TridentFasterRcnn,
    TridentMXNetResNetV2,
    TridentResNetV1C4,
    TridentResNetV1bC4,
    TridentResNetV2C4,
    TridentRpnHead,
    BboxC5Head,
    process_branch_outputs,
    process_branch_rpn_outputs,
)
from simpledet_tpu.dsl import TridentMaskRcnn  # noqa: F401,E402
