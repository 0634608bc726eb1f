"""Test oracle: a literal numpy transcription of the pycocotools COCOeval
bbox protocol (cocoeval.py evaluateImg/accumulate/summarize), used ONLY to
verify simpledet_tpu.eval.coco_eval against the canonical matching rules:

  * per-(image, category) greedy matching in descending score order at IoU
    thresholds .5:.05:.95, gts traversed ignore-last with the
    crowd-rematch + break-at-ignored rules
  * gt ignore = iscrowd OR explicit 'ignore' OR area outside the range
  * unmatched dets with out-of-range area are ignored
  * accumulate: global mergesort by score, cumulated TP/FP, 101-point
    interpolated precision envelope, recall = last TP rate

Deliberately loop-heavy and unoptimized — clarity over speed.
"""
import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNG = [("all", (0.0, 1e10)), ("small", (0.0, 32.0 ** 2)),
            ("medium", (32.0 ** 2, 96.0 ** 2)), ("large", (96.0 ** 2, 1e10))]
MAX_DETS = (1, 10, 100)


def iou_xywh(dt, gt, iscrowd):
    """maskUtils.iou for boxes: xywh, crowd gt -> intersection / det area."""
    out = np.zeros((len(dt), len(gt)))
    for j, g in enumerate(gt):
        for i, d in enumerate(dt):
            iw = min(d[0] + d[2], g[0] + g[2]) - max(d[0], g[0])
            ih = min(d[1] + d[3], g[1] + g[3]) - max(d[1], g[1])
            if iw > 0 and ih > 0:
                inter = iw * ih
                u = d[2] * d[3] if iscrowd[j] else \
                    d[2] * d[3] + g[2] * g[3] - inter
                if u > 0:
                    out[i, j] = inter / u
    return out


def evaluate_img(gts, dts, area_rng, max_det, ious):
    """pycocotools COCOeval.evaluateImg transcription. gts/dts are lists of
    dicts; ious precomputed for (sorted dts, gts in original order)."""
    for g in gts:
        g["_ignore"] = int(g.get("ignore", 0)) or g.get("iscrowd", 0) \
            or g["area"] < area_rng[0] or g["area"] > area_rng[1]
    gtind = np.argsort([g["_ignore"] for g in gts], kind="mergesort")
    gts = [gts[i] for i in gtind]
    dtind = np.argsort([-d["score"] for d in dts], kind="mergesort")
    dts = [dts[i] for i in dtind[:max_det]]
    iscrowd = [int(g.get("iscrowd", 0)) for g in gts]
    ious_ = ious[:, gtind] if len(ious) else ious

    T, G, D = len(IOU_THRS), len(gts), len(dts)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    gt_ig = np.array([g["_ignore"] for g in gts])
    dt_ig = np.zeros((T, D))
    if len(ious_):
        for tind, t in enumerate(IOU_THRS):
            for dind, d in enumerate(dts):
                iou = min([t, 1 - 1e-10])
                m = -1
                for gind, g in enumerate(gts):
                    if gtm[tind, gind] > 0 and not iscrowd[gind]:
                        continue
                    if m > -1 and gt_ig[m] == 0 and gt_ig[gind] == 1:
                        break
                    if ious_[dind, gind] < iou:
                        continue
                    iou = ious_[dind, gind]
                    m = gind
                if m == -1:
                    continue
                dt_ig[tind, dind] = gt_ig[m]
                dtm[tind, dind] = 1 + m          # pycocotools stores gt id
                gtm[tind, m] = 1 + dind
    a = np.array([d["area"] < area_rng[0] or d["area"] > area_rng[1]
                  for d in dts]).reshape((1, D))
    dt_ig = np.logical_or(dt_ig, np.logical_and(dtm == 0,
                                                np.repeat(a, T, 0)))
    return {
        "dtMatches": dtm,
        "dtScores": [d["score"] for d in dts],
        "gtIgnore": gt_ig,
        "dtIgnore": dt_ig,
    }


def evaluate(gt_dict, detections):
    """Full pycocotools protocol; returns the 12-metric summary dict."""
    img_ids = [im["id"] for im in gt_dict["images"]]
    cat_ids = sorted(c["id"] for c in gt_dict["categories"])
    gts_by = {}
    for ann in gt_dict.get("annotations", []):
        g = dict(ann)
        g.setdefault("area", g["bbox"][2] * g["bbox"][3])
        g.setdefault("iscrowd", 0)
        gts_by.setdefault((g["image_id"], g["category_id"]), []).append(g)
    dts_by = {}
    for d in detections:
        d = dict(d)
        d.setdefault("area", d["bbox"][2] * d["bbox"][3])
        dts_by.setdefault((d["image_id"], d["category_id"]), []).append(d)

    max_det = max(MAX_DETS)
    # computeIoU: dts sorted by -score, sliced to maxDet, gts original order
    ious = {}
    for img in img_ids:
        for cat in cat_ids:
            gt = gts_by.get((img, cat), [])
            dt = dts_by.get((img, cat), [])
            inds = np.argsort([-d["score"] for d in dt], kind="mergesort")
            dt = [dt[i] for i in inds[:max_det]]
            ious[(img, cat)] = iou_xywh(
                [d["bbox"] for d in dt], [g["bbox"] for g in gt],
                [int(g["iscrowd"]) for g in gt])

    eval_imgs = {}
    for cat in cat_ids:
        for aname, rng in AREA_RNG:
            for img in img_ids:
                gt = gts_by.get((img, cat), [])
                dt = dts_by.get((img, cat), [])
                if not gt and not dt:
                    eval_imgs[(img, cat, aname)] = None
                    continue
                eval_imgs[(img, cat, aname)] = evaluate_img(
                    [dict(g) for g in gt], [dict(d) for d in dt], rng,
                    max_det, ious[(img, cat)])

    T, R = len(IOU_THRS), len(REC_THRS)
    K, A, M = len(cat_ids), len(AREA_RNG), len(MAX_DETS)
    precision = -np.ones((T, R, K, A, M))
    recall = -np.ones((T, K, A, M))
    for k, cat in enumerate(cat_ids):
        for a, (aname, rng) in enumerate(AREA_RNG):
            for m, maxd in enumerate(MAX_DETS):
                E = [eval_imgs[(img, cat, aname)] for img in img_ids]
                E = [e for e in E if e is not None]
                if not E:
                    continue
                dt_scores = np.concatenate(
                    [e["dtScores"][:maxd] for e in E])
                inds = np.argsort(-dt_scores, kind="mergesort")
                dtm = np.concatenate(
                    [e["dtMatches"][:, :maxd] for e in E], axis=1)[:, inds]
                dt_ig = np.concatenate(
                    [e["dtIgnore"][:, :maxd] for e in E], axis=1)[:, inds]
                gt_ig = np.concatenate([e["gtIgnore"] for e in E])
                npig = np.count_nonzero(gt_ig == 0)
                if npig == 0:
                    continue
                tps = np.logical_and(dtm, np.logical_not(dt_ig))
                fps = np.logical_and(np.logical_not(dtm),
                                     np.logical_not(dt_ig))
                tp_sum = np.cumsum(tps, axis=1).astype(np.float64)
                fp_sum = np.cumsum(fps, axis=1).astype(np.float64)
                for t in range(T):
                    tp, fp = tp_sum[t], fp_sum[t]
                    nd = len(tp)
                    rc = tp / npig
                    pr = tp / (fp + tp + np.spacing(1))
                    q = np.zeros((R,))
                    recall[t, k, a, m] = rc[-1] if nd else 0
                    pr = pr.tolist()
                    for i in range(nd - 1, 0, -1):
                        if pr[i] > pr[i - 1]:
                            pr[i - 1] = pr[i]
                    inds_r = np.searchsorted(rc, REC_THRS, side="left")
                    for ri, pi in enumerate(inds_r):
                        if pi < nd:
                            q[ri] = pr[pi]
                    precision[t, :, k, a, m] = np.array(q)

    def _ap(iou=None, area="all", maxd=100):
        a = [n for n, _ in AREA_RNG].index(area)
        m = MAX_DETS.index(maxd)
        p = precision
        if iou is not None:
            t = int(np.argmin(np.abs(IOU_THRS - iou)))
            p = p[t:t + 1]
        p = p[:, :, :, a, m]
        return float(np.mean(p[p > -1])) if (p > -1).any() else -1.0

    def _ar(area="all", maxd=100):
        a = [n for n, _ in AREA_RNG].index(area)
        m = MAX_DETS.index(maxd)
        r = recall[:, :, a, m]
        return float(np.mean(r[r > -1])) if (r > -1).any() else -1.0

    return {
        "AP": _ap(), "AP50": _ap(iou=0.5), "AP75": _ap(iou=0.75),
        "APs": _ap(area="small"), "APm": _ap(area="medium"),
        "APl": _ap(area="large"),
        "AR1": _ar(maxd=1), "AR10": _ar(maxd=10), "AR100": _ar(maxd=100),
        "ARs": _ar(area="small"), "ARm": _ar(area="medium"),
        "ARl": _ar(area="large"),
    }
