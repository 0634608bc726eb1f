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


def _conv_w(arr):
    """Detectron OIHW conv weight -> flax HWIO."""
    return np.asarray(arr, np.float32).transpose(2, 3, 1, 0)


def convert_detectron_detector(weights, depth=50):
    """Whole-detector Detectron weights -> this framework's param tree.

    The analog of the reference utils/convert_from_detectron.py:1-475:
    backbone res blocks + affine (frozen) BN, FPN laterals/output convs,
    shared FPN RPN head, 2fc bbox head, and the 4conv+deconv mask head.
    Input: flat dict of Detectron blob names -> np arrays (np.load of an
    .npz made from the Detectron pkl). Returns a nested flax param dict.

    Layout/convention conversions (each is a real semantic difference):
      * conv weights OIHW -> HWIO;
      * conv1_w input channels flipped BGR -> RGB (Detectron nets eat BGR,
        our loader emits RGB — same fix as the reference converter header);
      * Detectron's sigmoid RPN objectness (A channels) -> our softmax
        pairs (2A channels, anchor-major (bg, fg)): bg logits zero,
        fg logits copied — softmax([0, x])[1] == sigmoid(x);
      * fc6 operates on CHW-flattened roi features in Detectron, ours on
        HWC-flattened: the 12544-dim input axis is permuted accordingly;
      * dense kernels [out, in] -> [in, out];
      * deconv (conv5_mask) [in, out, kh, kw] -> [kh, kw, in, out].
    """
    out = {}

    def put(path, arr):
        d = out
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = np.asarray(arr, np.float32)

    stage_units = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3),
                   152: (3, 8, 36, 3)}[depth]
    # fpn_inner_res{S}_{last_unit}_sum names encode the stage's last unit
    last_unit = {S + 2: stage_units[S] - 1 for S in range(4)}
    branch_conv = {"branch2a": "conv1", "branch2b": "conv2",
                   "branch2c": "conv3", "branch1": "sc_conv"}
    branch_bn = {"branch2a": "bn1", "branch2b": "bn2",
                 "branch2c": "bn3", "branch1": "sc_bn"}

    for name, arr in weights.items():
        arr = np.asarray(arr)
        if name == "conv1_w":
            k = _conv_w(arr)
            put(("backbone", "conv0", "kernel"), k[:, :, ::-1, :])  # BGR->RGB
            continue
        if name in ("res_conv1_bn_s", "conv1_bn_s"):
            put(("backbone", "bn0", "scale"), arr)
            continue
        if name in ("res_conv1_bn_b", "conv1_bn_b"):
            put(("backbone", "bn0", "bias"), arr)
            continue
        m = re.match(r"res(\d)_(\d+)_(branch\w+)_bn_([sb])$", name)
        if m:
            S, U, br, t = (int(m.group(1)), int(m.group(2)), m.group(3),
                           m.group(4))
            put(("backbone", f"stage{S - 1}_unit{U + 1}", branch_bn[br],
                 "scale" if t == "s" else "bias"), arr)
            continue
        m = re.match(r"res(\d)_(\d+)_(branch\w+)_w$", name)
        if m:
            S, U, br = int(m.group(1)), int(m.group(2)), m.group(3)
            put(("backbone", f"stage{S - 1}_unit{U + 1}", branch_conv[br],
                 "kernel"), _conv_w(arr))
            continue
        m = re.match(r"fpn_inner_res(\d)_(\d+)_sum(_lateral)?_([wb])$", name)
        if m:
            S, t = int(m.group(1)), m.group(4)
            put(("neck", f"P{S}_lateral",
                 "kernel" if t == "w" else "bias"),
                _conv_w(arr) if t == "w" else arr)
            continue
        m = re.match(r"fpn_res(\d)_(\d+)_sum_([wb])$", name)
        if m:
            S, t = int(m.group(1)), m.group(3)
            put(("neck", f"P{S}_conv", "kernel" if t == "w" else "bias"),
                _conv_w(arr) if t == "w" else arr)
            continue
        m = re.match(r"conv_rpn(_fpn\d)?_([wb])$", name)
        if m:
            t = m.group(2)
            put(("rpn_module", "rpn_conv", "kernel" if t == "w" else "bias"),
                _conv_w(arr) if t == "w" else arr)
            continue
        m = re.match(r"rpn_cls_logits(_fpn\d)?_([wb])$", name)
        if m:
            # sigmoid (A ch) -> softmax pairs (2A ch, anchor-major (bg, fg))
            if m.group(2) == "w":
                w = _conv_w(arr)                    # [1, 1, C, A]
                kh, kw, c, a = w.shape
                full = np.zeros((kh, kw, c, 2 * a), np.float32)
                full[..., 1::2] = w
                put(("rpn_module", "rpn_cls", "kernel"), full)
            else:
                a = arr.shape[0]
                full = np.zeros((2 * a,), np.float32)
                full[1::2] = arr
                put(("rpn_module", "rpn_cls", "bias"), full)
            continue
        m = re.match(r"rpn_bbox_pred(_fpn\d)?_([wb])$", name)
        if m:
            t = m.group(2)
            put(("rpn_module", "rpn_reg", "kernel" if t == "w" else "bias"),
                _conv_w(arr) if t == "w" else arr)
            continue
        m = re.match(r"fc(6|7)_([wb])$", name)
        if m:
            fc, t = m.group(1), m.group(2)
            ours = "fc1" if fc == "6" else "fc2"
            if t == "w":
                w = np.asarray(arr, np.float32)     # [out, in]
                if fc == "6":
                    # CHW-flattened input -> HWC-flattened input
                    o, i = w.shape
                    c = i // 49
                    w = w.reshape(o, c, 7, 7).transpose(0, 2, 3, 1) \
                         .reshape(o, i)
                put(("bbox_head", ours, "kernel"), w.T)
            else:
                put(("bbox_head", ours, "bias"), arr)
            continue
        m = re.match(r"(cls_score|bbox_pred)_([wb])$", name)
        if m:
            ours = "cls_logit" if m.group(1) == "cls_score" else "bbox_delta"
            if m.group(2) == "w":
                put(("bbox_head", ours, "kernel"),
                    np.asarray(arr, np.float32).T)
            else:
                put(("bbox_head", ours, "bias"), arr)
            continue
        m = re.match(r"(?:_\[mask\]_|mask_)?fcn(\d)_([wb])$", name)
        if m:
            i, t = m.group(1), m.group(2)
            put(("mask_head", f"mask_conv{i}",
                 "kernel" if t == "w" else "bias"),
                _conv_w(arr) if t == "w" else arr)
            continue
        m = re.match(r"conv5_mask_([wb])$", name)
        if m:
            if m.group(1) == "w":
                # Caffe2 deconv [in, out, kh, kw] -> flax [kh, kw, in, out]
                put(("mask_head", "mask_up", "kernel"),
                    np.asarray(arr, np.float32).transpose(2, 3, 0, 1))
            else:
                put(("mask_head", "mask_up", "bias"), arr)
            continue
        m = re.match(r"mask_fcn_logits_([wb])$", name)
        if m:
            if m.group(1) == "w":
                put(("mask_head", "mask_fcn_logit", "kernel"), _conv_w(arr))
            else:
                put(("mask_head", "mask_fcn_logit", "bias"), arr)
            continue
        # momentum buffers / lr metadata in Detectron pkls are skipped
    return out


# alias preserving the reference entry point name
convert_from_detectron = convert_detectron_detector


if __name__ == "__main__":
    import flax
    import os

    ap = argparse.ArgumentParser()
    ap.add_argument("--npz", required=True)
    ap.add_argument("--out", required=True,
                    help="prefix, e.g. pretrain_model/resnet-v1-50")
    ap.add_argument("--style", default="torchvision",
                    choices=["torchvision", "detectron"],
                    help="torchvision: backbone-only resnet .pth->npz; "
                         "detectron: whole detector (backbone+FPN+heads)")
    ap.add_argument("--depth", type=int, default=50)
    args = ap.parse_args()
    npz = dict(np.load(args.npz))
    if args.style == "detectron":
        params = convert_detectron_detector(npz, depth=args.depth)
    else:
        params = convert_torchvision_resnet(npz)
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out + "-0000.params", "wb") as f:
        f.write(flax.serialization.msgpack_serialize(params))
    n = sum(1 for _ in str(params))
    print(f"wrote {args.out}-0000.params")
