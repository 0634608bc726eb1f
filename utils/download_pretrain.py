"""Pretrain download helper (reference utils/download_pretrain.py).

This environment has no egress; point PRETRAIN_URLS at an internal mirror or
place converted checkpoints under pretrain_model/ manually
(utils/convert_pretrain.py converts torchvision/detectron resnet weights)."""
import os
import sys

PRETRAIN_URLS = {
    "resnet-v1-50": None,
    "resnet-v1-101": None,
    "resnet-v2-50": None,
}

if __name__ == "__main__":
    os.makedirs("pretrain_model", exist_ok=True)
    print("No egress in this environment. Convert weights locally with "
          "utils/convert_pretrain.py and place them in pretrain_model/.")
    sys.exit(0)
