"""Edit checkpoint weights (reference utils/contrib/edit_model_weight.py):
rename / delete / inspect entries of a .params file.

Usage: python utils/contrib/edit_model_weight.py --params ckpt-0006.params \
           [--drop PREFIX] [--rename OLD NEW] [--out new.params] [--list]
"""
import argparse

import flax
import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--params", required=True)
    ap.add_argument("--drop", action="append", default=[])
    ap.add_argument("--rename", nargs=2, action="append", default=[])
    ap.add_argument("--out")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()

    with open(args.params, "rb") as f:
        tree = flax.serialization.msgpack_restore(f.read())
    flat = flax.traverse_util.flatten_dict(tree, sep="/")
    if args.list:
        for k, v in sorted(flat.items()):
            print(k, np.asarray(v).shape)
        return
    out = {}
    for k, v in flat.items():
        if any(k.startswith(d) for d in args.drop):
            continue
        for old, new in args.rename:
            if k.startswith(old):
                k = new + k[len(old):]
        out[k] = v
    tree = flax.traverse_util.unflatten_dict(out, sep="/")
    with open(args.out or args.params, "wb") as f:
        f.write(flax.serialization.msgpack_serialize(tree))
    print(f"wrote {args.out or args.params} ({len(out)} tensors)")


if __name__ == "__main__":
    main()
