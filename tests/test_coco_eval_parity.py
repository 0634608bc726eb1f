"""COCOEval parity vs a literal transcription of the pycocotools protocol.

The reference gates mAP on pycocotools (detection_test.py:296-309); this
randomized test enforces that the in-repo vectorized evaluator reproduces
the canonical matching rules exactly — crowds, explicit ignore flags, area
ranges, score/IoU ties, maxDets truncation — plus a throughput guard for
large evals.
"""
import time

import numpy as np
import pytest

from simpledet_tpu.eval.coco_eval import COCOEval
from tests import coco_protocol_oracle as oracle


def _rand_box(rng, size=640, big=False):
    x, y = rng.uniform(0, size * 0.8, 2)
    if big:
        w, h = rng.uniform(100, 300, 2)
    else:
        # spread across COCO area ranges: tiny to large
        w, h = np.exp(rng.uniform(np.log(4), np.log(300), 2))
    return [float(x), float(y), float(w), float(h)]


def _make_dataset(rng, n_images=12, n_cats=4, crowd_p=0.15, ignore_p=0.1,
                  max_gt=8, max_dt=14):
    images = [{"id": 100 + i, "width": 640, "height": 640}
              for i in range(n_images)]
    cats = [{"id": c * 3 + 1} for c in range(n_cats)]  # non-contiguous ids
    anns, dets = [], []
    aid = 1
    for im in images:
        for c in cats:
            if rng.rand() < 0.25:
                continue  # some (img,cat) pairs have no gt at all
            for _ in range(rng.randint(0, max_gt)):
                box = _rand_box(rng)
                anns.append({
                    "id": aid, "image_id": im["id"], "category_id": c["id"],
                    "bbox": box, "area": box[2] * box[3],
                    "iscrowd": int(rng.rand() < crowd_p),
                    "ignore": int(rng.rand() < ignore_p),
                })
                aid += 1
        for c in cats:
            n_d = rng.randint(0, max_dt)
            for j in range(n_d):
                if anns and rng.rand() < 0.55:
                    # perturb a gt box -> realistic partial overlaps
                    src = anns[rng.randint(len(anns))]["bbox"]
                    box = [src[0] + rng.randn() * 8, src[1] + rng.randn() * 8,
                           max(src[2] + rng.randn() * 10, 2),
                           max(src[3] + rng.randn() * 10, 2)]
                else:
                    box = _rand_box(rng)
                # score ties are common in practice (quantized heads)
                score = float(np.round(rng.rand(), 2))
                dets.append({"image_id": im["id"], "category_id": c["id"],
                             "bbox": [float(b) for b in box],
                             "score": score})
    gt = {"images": images, "annotations": anns, "categories": cats}
    return gt, dets


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_cocoeval_matches_pycocotools_protocol(seed):
    rng = np.random.RandomState(seed)
    gt, dets = _make_dataset(rng)
    want = oracle.evaluate(gt, [dict(d) for d in dets])
    got = COCOEval(gt, iou_type="bbox").evaluate([dict(d) for d in dets])
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-12,
                                   err_msg=f"metric {k} (seed {seed})")


def test_cocoeval_duplicate_boxes_and_exact_ties():
    """Identical dets (equal IoU AND equal score) stress the tie-breaking:
    equal IoUs go to the later gt in ignore-sorted order, equal scores keep
    concat order under mergesort."""
    images = [{"id": 1, "width": 100, "height": 100}]
    cats = [{"id": 1}]
    g = [10.0, 10.0, 20.0, 20.0]
    anns = [
        {"id": 1, "image_id": 1, "category_id": 1, "bbox": g,
         "area": 400.0, "iscrowd": 0},
        {"id": 2, "image_id": 1, "category_id": 1, "bbox": list(g),
         "area": 400.0, "iscrowd": 0},  # duplicate gt
        {"id": 3, "image_id": 1, "category_id": 1, "bbox": [60, 60, 10, 10],
         "area": 100.0, "iscrowd": 1},  # crowd
    ]
    dets = [
        {"image_id": 1, "category_id": 1, "bbox": list(g), "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": list(g), "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": list(g), "score": 0.9},
        {"image_id": 1, "category_id": 1, "bbox": [61, 59, 10, 12],
         "score": 0.9},
    ]
    gt = {"images": images, "annotations": anns, "categories": cats}
    want = oracle.evaluate(gt, [dict(d) for d in dets])
    got = COCOEval(gt).evaluate([dict(d) for d in dets])
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-12,
                                   err_msg=f"metric {k}")


def test_cocoeval_maxdet_truncation():
    """>100 dets in one (img,cat): maxDets must cap matching + accumulate."""
    rng = np.random.RandomState(5)
    images = [{"id": 7, "width": 640, "height": 640}]
    cats = [{"id": 2}]
    anns = [{"id": i + 1, "image_id": 7, "category_id": 2,
             "bbox": _rand_box(rng), "iscrowd": 0} for i in range(6)]
    for a in anns:
        a["area"] = a["bbox"][2] * a["bbox"][3]
    dets = [{"image_id": 7, "category_id": 2, "bbox": _rand_box(rng),
             "score": float(rng.rand())} for _ in range(140)]
    gt = {"images": images, "annotations": anns, "categories": cats}
    want = oracle.evaluate(gt, [dict(d) for d in dets])
    got = COCOEval(gt).evaluate([dict(d) for d in dets])
    for k in want:
        np.testing.assert_allclose(got[k], want[k], atol=1e-12,
                                   err_msg=f"metric {k}")


def test_cocoeval_5k_images_fast():
    """Throughput guard: a 5k-image, 80-category-shaped eval finishes in
    seconds (the old per-(img,cat) Python matcher took tens of minutes)."""
    rng = np.random.RandomState(0)
    n_img, n_cat = 5000, 80
    images = [{"id": i, "width": 640, "height": 640} for i in range(n_img)]
    cats = [{"id": c + 1} for c in range(n_cat)]
    anns, dets = [], []
    aid = 0
    for i in range(n_img):
        # ~7 gts and ~20 dets per image, spread over a few categories
        for _ in range(7):
            c = int(rng.randint(n_cat)) + 1
            box = _rand_box(rng)
            aid += 1
            anns.append({"id": aid, "image_id": i, "category_id": c,
                         "bbox": box, "area": box[2] * box[3], "iscrowd": 0})
        for _ in range(20):
            c = int(rng.randint(n_cat)) + 1
            dets.append({"image_id": i, "category_id": c,
                         "bbox": _rand_box(rng),
                         "score": float(rng.rand())})
    gt = {"images": images, "annotations": anns, "categories": cats}
    t0 = time.time()
    s = COCOEval(gt).evaluate(dets)
    dt = time.time() - t0
    assert np.isfinite(s["AP"])
    assert dt < 120, f"5k-image eval took {dt:.1f}s"
