"""Adversarial COCOeval fixtures with HAND-COMPUTED expected values.

The in-repo evaluator (simpledet_tpu/eval/coco_eval.py) was validated in
round 2 against tests/coco_protocol_oracle.py — but both were written by
the same author, so a shared misreading of the pycocotools protocol would
pass both. These fixtures target the tricky protocol corners with expected
numbers derived by hand from the protocol definition (reference consumer:
/root/reference/detection_test.py:296-309), NOT computed by either
implementation:

  * the 101-point interpolated AP: precision envelope (running max from
    the right) sampled at recalls {0, .01, ..., 1}, mean over the 10 IoU
    thresholds {.5, .55, ..., .95};
  * crowd gt may be matched by MANY detections, each becoming ignored
    (never FP), and crowd/ignored gt never count toward n_gt;
  * detections matched to an ignored gt are ignored, not FP;
  * area-range bounds are inclusive on both ends (an area exactly 32^2
    belongs to both 'small' and 'medium');
  * ties in detection score are broken by original order (stable sort).
"""
import numpy as np
import pytest

from simpledet_tpu.eval.coco_eval import COCOEval


def make_gt(anns, hw=(200, 300)):
    img_ids = sorted({a["image_id"] for a in anns} | {1})
    for i, a in enumerate(anns):
        a.setdefault("id", i + 1)
        a.setdefault("iscrowd", 0)
        a.setdefault("area", a["bbox"][2] * a["bbox"][3])
    return {
        "images": [{"id": i, "height": hw[0], "width": hw[1]}
                   for i in img_ids],
        "annotations": anns,
        "categories": [{"id": 1, "name": "c1"}],
    }


def dt(image_id, x, y, w, h, score, cat=1):
    return {"image_id": image_id, "category_id": cat,
            "bbox": [x, y, w, h], "score": score}


def test_basic_interpolated_ap_hand_computed():
    """Two gt, one exact match + one IoU=0.72 match.

    Hand derivation: D2 (score .8) is a 9x8 box inside the 10x10 G2 ->
    IoU = 72/100 = 0.72: TP at thresholds {.5,.55,.6,.65,.7} (5), FP at
    {.75,...,.95} (5).
      * TP thresholds: both dts TP -> precision 1 at every recall ->
        AP_t = 1.
      * FP thresholds: rc = [0.5, 0.5], envelope = [1, 0.5]; recall
        thresholds <= 0.5 (51 of 101 points) read precision 1.0, the rest
        0 -> AP_t = 51/101.
    mAP = (5*1 + 5*51/101)/10 = 0.7524752475...
    """
    gt = make_gt([
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10]},
        {"image_id": 1, "category_id": 1, "bbox": [100, 100, 10, 10]},
    ])
    dts = [dt(1, 0, 0, 10, 10, 0.9),
           dt(1, 100, 100, 9, 8, 0.8)]
    s = COCOEval(gt).evaluate(dts)
    assert abs(s["AP50"] - 1.0) < 1e-9
    assert abs(s["AP75"] - 51 / 101) < 1e-9
    expect = (5 * 1.0 + 5 * (51 / 101)) / 10
    assert abs(s["AP"] - expect) < 1e-9, (s["AP"], expect)


def test_crowd_rematching_not_fp():
    """A high-scoring detection inside a crowd region must be IGNORED, not
    counted FP ahead of the real TP; the crowd gt can absorb several
    detections; crowd gt does not count toward n_gt.

    With correct crowd handling: D1, D2 (in crowd, scores .9/.85) ignored,
    D3 TP on the single counted gt -> recall 1, precision 1 -> AP = 1.
    Broken crowd handling would make D1/D2 FPs ranked above the TP and
    drag AP to ~1/3.
    """
    gt = make_gt([
        {"image_id": 1, "category_id": 1, "bbox": [50, 50, 100, 100],
         "iscrowd": 1},
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10]},
    ])
    dts = [dt(1, 60, 60, 10, 10, 0.9),    # fully inside crowd
           dt(1, 90, 90, 12, 12, 0.85),   # also inside crowd (re-match)
           dt(1, 0, 0, 10, 10, 0.5)]      # the real TP
    s = COCOEval(gt).evaluate(dts)
    assert abs(s["AP"] - 1.0) < 1e-9, s["AP"]
    assert abs(s["AR100"] - 1.0) < 1e-9


def test_detection_matched_to_ignored_gt_is_ignored():
    """gt with explicit ignore=1: a detection matching it is removed from
    the ranking (ignored), not an FP. AP stays 1.0."""
    gt = make_gt([
        {"image_id": 1, "category_id": 1, "bbox": [50, 50, 20, 20],
         "ignore": 1},
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10]},
    ])
    dts = [dt(1, 50, 50, 20, 20, 0.95),   # exactly on the ignored gt
           dt(1, 0, 0, 10, 10, 0.6)]
    s = COCOEval(gt).evaluate(dts)
    assert abs(s["AP"] - 1.0) < 1e-9, s["AP"]


def test_area_range_bounds_inclusive():
    """area == 32^2 == 1024 sits on the small/medium boundary: COCO ranges
    are [0, 1024] and [1024, 9216], both inclusive -> the gt (and its
    detection) appears in BOTH APs and APm."""
    gt = make_gt([
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 32, 32],
         "area": 1024},
    ])
    dts = [dt(1, 0, 0, 32, 32, 0.9)]
    s = COCOEval(gt).evaluate(dts)
    assert abs(s["APs"] - 1.0) < 1e-9, s["APs"]
    assert abs(s["APm"] - 1.0) < 1e-9, s["APm"]
    assert s["APl"] == -1.0


def test_score_tie_stable_order():
    """Equal scores: pycocotools sorts with a stable mergesort, so the
    FIRST detection in input order ranks first. Here that is an FP, so
    precision at the TP is 1/2 -> AP = 0.5 at every threshold (envelope
    [0.5, 0.5], all 101 recall points read 0.5).
    """
    gt = make_gt([
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10]},
    ])
    dts = [dt(1, 100, 100, 10, 10, 0.5),  # FP, listed first
           dt(1, 0, 0, 10, 10, 0.5)]      # TP, same score
    s = COCOEval(gt).evaluate(dts)
    assert abs(s["AP"] - 0.5) < 1e-9, s["AP"]


def test_maxdets_1_truncation():
    """AR1 keeps only the highest-scoring detection per (image, cat):
    with 2 gts and both matched, AR1 = 0.5, AR100 = 1.0."""
    gt = make_gt([
        {"image_id": 1, "category_id": 1, "bbox": [0, 0, 10, 10]},
        {"image_id": 1, "category_id": 1, "bbox": [100, 100, 10, 10]},
    ])
    dts = [dt(1, 0, 0, 10, 10, 0.9),
           dt(1, 100, 100, 10, 10, 0.8)]
    s = COCOEval(gt).evaluate(dts)
    assert abs(s["AR1"] - 0.5) < 1e-9
    assert abs(s["AR100"] - 1.0) < 1e-9


# ------------------------------- properties -------------------------------

def _random_case(seed, n_img=3, n_gt=5, n_dt=8):
    rng = np.random.RandomState(seed)
    anns, dts = [], []
    for img in range(1, n_img + 1):
        for _ in range(n_gt):
            x, y = rng.randint(0, 150, 2)
            w, h = rng.randint(5, 60, 2)
            anns.append({"image_id": img, "category_id": 1,
                         "bbox": [int(x), int(y), int(w), int(h)]})
        for _ in range(n_dt):
            x, y = rng.randint(0, 150, 2)
            w, h = rng.randint(5, 60, 2)
            dts.append(dt(img, int(x), int(y), int(w), int(h),
                          float(rng.rand())))
    return make_gt(anns), dts


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_ap_invariant_to_trailing_fp(seed):
    """Appending an FP with a score below every existing detection cannot
    change AP (it extends the PR curve past the last recall point with
    lower precision, which the right-to-left envelope ignores)."""
    gt, dts = _random_case(seed)
    base = COCOEval(gt).evaluate(dts)
    dts2 = dts + [dt(1, 190, 190, 5, 5, 1e-6)]
    again = COCOEval(gt).evaluate(dts2)
    assert abs(base["AP"] - again["AP"]) < 1e-12


@pytest.mark.parametrize("seed", [0, 1])
def test_ap_monotone_in_tp_score(seed):
    """Raising the score of a detection that exactly matches a gt (a TP at
    every threshold) can only raise or keep AP."""
    gt, dts = _random_case(seed)
    g0 = gt["annotations"][0]
    x, y, w, h = g0["bbox"]
    low = dts + [dt(g0["image_id"], x, y, w, h, 0.05)]
    high = dts + [dt(g0["image_id"], x, y, w, h, 0.99)]
    ap_low = COCOEval(gt).evaluate(low)["AP"]
    ap_high = COCOEval(gt).evaluate(high)["AP"]
    assert ap_high >= ap_low - 1e-12
