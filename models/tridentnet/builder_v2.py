"""Compat shim: the reference's `models.tridentnet.builder_v2` import
surface (reference models/tridentnet/builder_v2.py — the v1/v1b trident
backbones used by tridentnet_r*v1c4 and tridentnet_fast_r*v1bc4 configs),
backed by simpledet_tpu."""
from simpledet_tpu.dsl import (  # noqa: F401
    TridentMXNetResNetV2,
    TridentResNetV1C4,
    TridentResNetV1bC4,
    TridentResNetV2C4,
)
