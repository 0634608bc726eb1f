"""Compat shim: reference utils/convert_from_detectron.py — external
pretrained-weight conversion lives in utils/convert_pretrain.py (regex name
mapping + BN folding for torchvision/detectron-style resnets)."""
from utils.convert_pretrain import (  # noqa: F401
    convert_from_detectron,
    convert_torchvision_resnet,
    fold_bn,
)
