"""Convert external pretrained ResNet weights into this framework's layout
(the analog of reference utils/convert_from_detectron.py: regex name
mapping + BN handling; here the BN fold replaces merge_bn entirely).

Supported input: a numpy .npz of a torchvision-style resnet state dict
(convert a .pth offline with torch:  np.savez(out, **{k: v.numpy()}) ).
Output: pretrain_model/<name>-0000.params in our flax msgpack format, with
BatchNorm (gamma, beta, running stats) folded into FrozenBN (scale, bias).

Name mapping (torchvision -> ours):
  conv1.weight                 -> backbone/conv0/kernel (OIHW -> HWIO)
  bn1.*                        -> backbone/bn0/{scale,bias} (folded)
  layer{L}.{U}.conv{K}.weight  -> backbone/stage{L}_unit{U+1}/conv{K}/kernel
  layer{L}.{U}.bn{K}.*         -> backbone/stage{L}_unit{U+1}/bn{K}/*
  layer{L}.{U}.downsample.0/1  -> .../sc_conv, sc_bn

Usage: python utils/convert_pretrain.py --npz resnet50.npz \
           --out pretrain_model/resnet-v1-50
"""
import argparse
import re

import numpy as np


def fold_bn(gamma, beta, mean, var, eps=1e-5):
    scale = gamma / np.sqrt(var + eps)
    return scale.astype(np.float32), (beta - mean * scale).astype(np.float32)


def convert_torchvision_resnet(npz):
    """dict of torchvision names -> nested flax param dict under backbone/."""
    out = {}

    def put(path, arr):
        d = out
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = arr

    bns = {}
    for name, arr in npz.items():
        arr = np.asarray(arr)
        if name.startswith("fc."):
            continue
        m = re.match(r"conv1\.weight", name)
        if m:
            put(("backbone", "conv0", "kernel"),
                arr.transpose(2, 3, 1, 0).astype(np.float32))
            continue
        m = re.match(r"bn1\.(weight|bias|running_mean|running_var)", name)
        if m:
            bns.setdefault(("backbone", "bn0"), {})[m.group(1)] = arr
            continue
        m = re.match(r"layer(\d)\.(\d+)\.conv(\d)\.weight", name)
        if m:
            L, U, K = int(m.group(1)), int(m.group(2)), int(m.group(3))
            put(("backbone", f"stage{L}_unit{U + 1}", f"conv{K}", "kernel"),
                arr.transpose(2, 3, 1, 0).astype(np.float32))
            continue
        m = re.match(r"layer(\d)\.(\d+)\.bn(\d)\."
                     r"(weight|bias|running_mean|running_var)", name)
        if m:
            L, U, K = int(m.group(1)), int(m.group(2)), int(m.group(3))
            bns.setdefault(("backbone", f"stage{L}_unit{U + 1}",
                            f"bn{K}"), {})[m.group(4)] = arr
            continue
        m = re.match(r"layer(\d)\.(\d+)\.downsample\.0\.weight", name)
        if m:
            L, U = int(m.group(1)), int(m.group(2))
            put(("backbone", f"stage{L}_unit{U + 1}", "sc_conv", "kernel"),
                arr.transpose(2, 3, 1, 0).astype(np.float32))
            continue
        m = re.match(r"layer(\d)\.(\d+)\.downsample\.1\."
                     r"(weight|bias|running_mean|running_var)", name)
        if m:
            L, U = int(m.group(1)), int(m.group(2))
            bns.setdefault(("backbone", f"stage{L}_unit{U + 1}",
                            "sc_bn"), {})[m.group(3)] = arr

    for path, d in bns.items():
        scale, bias = fold_bn(d["weight"], d["bias"], d["running_mean"],
                              d["running_var"])
        put(path + ("scale",), scale)
        put(path + ("bias",), bias)
    return out


# alias preserving the reference entry point name
convert_from_detectron = convert_torchvision_resnet


if __name__ == "__main__":
    import flax
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", required=True)
    ap.add_argument("--out", required=True,
                    help="prefix, e.g. pretrain_model/resnet-v1-50")
    args = ap.parse_args()
    npz = dict(np.load(args.npz))
    params = convert_torchvision_resnet(npz)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out + "-0000.params", "wb") as f:
        f.write(flax.serialization.msgpack_serialize(params))
    n = sum(1 for _ in str(params))
    print(f"wrote {args.out}-0000.params")
