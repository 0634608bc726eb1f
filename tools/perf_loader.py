"""Host input-pipeline throughput benchmark (SURVEY.md hard-part #4).

Generates COCO-sized jpegs once, then measures the Loader's records/s with
the real transform chain (jpeg decode + normalize + resize to 800/1333 +
flip + pad) at several worker counts. The number to beat: the train step's
consumption rate (~30 img/s/chip at the round-2 bench), with >=2x headroom
so the loop is never input-bound. Reference needed 8-12 worker threads per
GPU (core/detection_input.py:713-728).

Usage: python tools/perf_loader.py [--images 64] [--batches 24] [--batch 2]
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_dataset(root, n_images):
    import cv2
    os.makedirs(root, exist_ok=True)
    rng = np.random.RandomState(0)
    roidb = []
    for i in range(n_images):
        h, w = (800, 1200) if i % 2 == 0 else (1200, 800)
        img = rng.randint(0, 255, (h, w, 3), np.uint8)
        path = os.path.join(root, f"im{i}.jpg")
        if not os.path.exists(path):
            cv2.imwrite(path, img)
        roidb.append({
            "image_url": path, "im_id": i + 1, "h": h, "w": w,
            "gt_class": [1], "gt_bbox": [[10.0, 10.0, 200.0, 200.0]],
            "flipped": bool(i % 4 >= 2),
        })
    return roidb


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--batches", type=int, default=24)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--workers", type=int, nargs="+",
                    default=[0, 2, 4, 8, 12])
    args = ap.parse_args()

    from simpledet_tpu.data.loader import Loader
    from simpledet_tpu.data.transforms import (Flip2DImageBbox, Norm2DImage,
                                               Pad2DImageBbox, ReadRoiRecord,
                                               RenameRecord,
                                               Resize2DImageBbox)

    class NormP:
        mean = (122.7717, 115.9465, 102.9801)
        std = (1.0, 1.0, 1.0)

    class ResizeP:
        short, long = 800, 1333

    class PadP:
        short, long, max_num_gt = 800, 1333, 100

    transforms = [ReadRoiRecord(None), Norm2DImage(NormP),
                  Resize2DImageBbox(ResizeP), Flip2DImageBbox(),
                  Pad2DImageBbox(PadP), RenameRecord(dict(image="data"))]

    roidb = make_dataset("/tmp/simpledet_loader_bench", args.images)
    for w in args.workers:
        loader = Loader(roidb, transforms, args.batch, shuffle=True,
                        num_workers=w, keys=("data", "im_info", "gt_bbox"))
        # warmup epoch fragment (fills caches, starts the pool)
        it = iter(loader)
        next(it)
        t0 = time.time()
        n = 0
        done = 0
        while done < args.batches:
            b = next(it, None)
            if b is None:
                it = iter(loader)
                continue
            n += b["data"].shape[0]
            done += 1
        dt = time.time() - t0
        print(f"workers={w:2d}: {n / dt:7.2f} img/s "
              f"({dt / done * 1000:6.1f} ms/batch of {args.batch})")


if __name__ == "__main__":
    main()
