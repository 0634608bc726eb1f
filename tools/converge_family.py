"""Chip-scale driver for the per-family convergence recipes.

Runs train -> eval for one of the converge_* configs on whatever backend
JAX selects (the real TPU chip under axon; set JAX_PLATFORMS=cpu +
XLA_FLAGS=--xla_force_host_platform_device_count=8 for the CI mesh) and
prints the gate metrics. Used to tune the per-family defaults recorded in
config/converge_{mask,retina,cascade,fcos}.py; CI then asserts the same
recipe on the CPU mesh (tests/test_convergence_families.py).

  python tools/converge_family.py --family mask --batch 8 --epochs 40
"""
import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", required=True,
                    choices=["mask", "retina", "cascade", "fcos", "faster", "trident", "crowd", "freeanchor", "reppoints", "tsd", "nasfpn", "sepc", "msrcnn"])
    ap.add_argument("--batch", default=None)
    ap.add_argument("--epochs", default=None)
    ap.add_argument("--lr", default=None)
    ap.add_argument("--warmup", default=None)
    ap.add_argument("--lr-iter", default=None)
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--skip-train", action="store_true")
    ap.add_argument("--losses-out", default=None,
                    help="write per-step losses jsonl here")
    args = ap.parse_args()

    fam = args.family
    if fam == "faster":
        prefix, cfg, name = "CONVERGE", "config/converge_test.py", \
            "converge_test"
    else:
        prefix = f"CONVERGE_{fam.upper()}"
        cfg, name = f"config/converge_{fam}.py", f"converge_{fam}"

    root = args.data_root or (
        "/tmp/simpledet_converge_mask" if fam in ("mask", "msrcnn")
        else "/tmp/simpledet_converge_crowd" if fam == "crowd"
        else "/tmp/simpledet_converge")
    os.environ["CONVERGE_DATA_ROOT"] = root
    for k, v in [("BATCH", args.batch), ("EPOCHS", args.epochs),
                 ("LR", args.lr), ("WARMUP", args.warmup),
                 ("LR_ITER", args.lr_iter)]:
        if v is not None:
            os.environ[f"{prefix}_{k}"] = str(v)

    if not os.path.exists(os.path.join(root, "annotations.json")):
        shutil.rmtree(root, ignore_errors=True)
        if fam == "crowd":
            from tests.fixtures import make_crowd_dataset
            make_crowd_dataset(root, n_images=16,
                               set_names=("converge_train",))
        else:
            from tests.fixtures import make_micro_dataset
            make_micro_dataset(root, n_images=16,
                               set_names=("converge_train",),
                               shapes="ellipse" if fam in ("mask", "msrcnn") else "rect")
        print(f"dataset written to {root}")

    hist = []
    if not args.skip_train:
        shutil.rmtree(f"experiments/{name}", ignore_errors=True)
        from detection_train import train_net
        t0 = time.time()
        train_net(cfg, loss_history=hist)
        print(f"train done in {time.time()-t0:.0f}s, {len(hist)} steps")
        if hist:
            tot = [h["total_loss"] for h in hist]
            print(f"loss first20={sum(tot[:20])/min(len(tot),20):.3f} "
                  f"last20={sum(tot[-20:])/min(len(tot),20):.3f}")
        if args.losses_out:
            with open(args.losses_out, "w") as f:
                for h in hist:
                    f.write(json.dumps(h) + "\n")

    if fam == "crowd":
        from detection_test import test_net
        os.environ["CONVERGE_CROWD_NMS"] = "setnms"
        s_set = test_net(cfg)
        os.environ["CONVERGE_CROWD_NMS"] = "nms"
        s_van = test_net(cfg)
        del os.environ["CONVERGE_CROWD_NMS"]
        print("GATE setnms AP:", s_set["AP"], "vanilla AP:", s_van["AP"],
              "delta:", s_set["AP"] - s_van["AP"])
    elif fam in ("mask", "msrcnn"):
        from mask_test import mask_test_net
        summaries = mask_test_net(cfg)
        print("GATE box AP:", summaries["bbox"]["AP"],
              "segm AP:", summaries["segm"]["AP"],
              "segm AP50:", summaries["segm"]["AP50"],
              "segm AP75:", summaries["segm"]["AP75"])
    else:
        from detection_test import test_net
        summary = test_net(cfg)
        print("GATE AP:", summary["AP"], "AP50:", summary["AP50"],
              "AP75:", summary["AP75"])


if __name__ == "__main__":
    main()
