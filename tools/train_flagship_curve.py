"""Train the bf16 flagship on synthetic COCO-shaped data on the real TPU
chip and commit the loss curve (verdict r2 item #1: proxy evidence the
flagship's losses/targets/optimizer are wired right at full scale).

Writes experiments/flagship_synth_curve/losses.jsonl (one line per step)
and refreshes the summary table in experiments/converge_curve.md.

Usage: FLAGSHIP_CURVE_EPOCHS=10 python tools/train_flagship_curve.py
"""
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_synth_coco(root, n_images=48, seed=0):
    """COCO-shaped images (800x1200 / 1200x800) with solid colored boxes;
    same roidb schema as utils/create_coco_roidb.py."""
    import cv2

    from simpledet_tpu.data.roidb import save_roidb

    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)
    images, annotations, roidb = [], [], []
    ann_id = 1
    for i in range(n_images):
        h, w = (800, 1200) if i % 2 == 0 else (1200, 800)
        img = rng.randint(0, 60, (h, w, 3), np.uint8)
        boxes, classes = [], []
        for _ in range(rng.randint(2, 8)):
            bw, bh = rng.randint(60, 400), rng.randint(60, 400)
            x1 = rng.randint(0, w - bw)
            y1 = rng.randint(0, h - bh)
            # class is a deterministic function of color (like the micro
            # fixture, tests/fixtures.py:34-36) so the classification loss
            # CAN descend — with random colors bbox_cls plateaus at the
            # class prior and the curve proves nothing about learning
            cls = int(rng.randint(1, 81))
            color = ((37 * cls) % 200 + 55, (91 * cls) % 200 + 55,
                     (151 * cls) % 200 + 55)
            cv2.rectangle(img, (x1, y1), (x1 + bw, y1 + bh), color, -1)
            boxes.append([x1, y1, x1 + bw - 1, y1 + bh - 1])
            classes.append(cls)
        path = os.path.join(img_dir, f"im{i}.jpg")
        cv2.imwrite(path, img[:, :, ::-1])
        images.append({"id": i + 1, "file_name": f"im{i}.jpg",
                       "height": h, "width": w})
        for b, c in zip(boxes, classes):
            x1, y1, x2, y2 = b
            annotations.append({
                "id": ann_id, "image_id": i + 1, "category_id": c,
                "bbox": [x1, y1, x2 - x1 + 1, y2 - y1 + 1],
                "area": (x2 - x1 + 1) * (y2 - y1 + 1), "iscrowd": 0})
            ann_id += 1
        roidb.append({"image_url": path, "im_id": i + 1, "h": h, "w": w,
                      "gt_class": classes,
                      "gt_bbox": [[float(v) for v in b] for b in boxes],
                      "flipped": False})
    with open(os.path.join(root, "annotations.json"), "w") as f:
        json.dump({"images": images, "annotations": annotations,
                   "categories": [{"id": c, "name": f"c{c}"}
                                  for c in range(1, 81)]}, f)
    save_roidb(roidb, "flagship_synth", cache_dir=os.path.join(root, "cache"))


def main():
    root = os.environ.get("FLAGSHIP_SYNTH_ROOT",
                          "/tmp/simpledet_flagship_synth")
    if not os.path.exists(os.path.join(root, "cache",
                                       "flagship_synth.roidb")):
        shutil.rmtree(root, ignore_errors=True)
        make_synth_coco(root)
        print("synthetic dataset written", flush=True)

    shutil.rmtree("experiments/flagship_synth_curve", ignore_errors=True)
    from detection_train import train_net
    hist = []
    t0 = time.time()
    train_net("config/flagship_synth_curve.py", loss_history=hist)
    dt = time.time() - t0

    os.makedirs("experiments/flagship_synth_curve", exist_ok=True)
    out = "experiments/flagship_synth_curve/losses.jsonl"
    with open(out, "w") as f:
        for i, h in enumerate(hist):
            f.write(json.dumps(dict(step=i, **{k: round(v, 5)
                                               for k, v in h.items()})) + "\n")
    tot = np.array([h["total_loss"] for h in hist])
    w = max(len(tot) // 10, 1)
    print(f"{len(tot)} steps in {dt:.0f}s", flush=True)
    print("windowed mean total_loss:", flush=True)
    for i in range(0, len(tot), w):
        print(f"  steps {i:4d}-{min(i + w, len(tot)):4d}: "
              f"{tot[i:i + w].mean():.4f}", flush=True)
    print(f"wrote {out}", flush=True)


if __name__ == "__main__":
    main()
