"""Self-contained COCO detection evaluation (bbox + segm).

Implements the COCOeval protocol (the reference delegates to pycocotools,
detection_test.py:296-309; that package is not a dependency here): greedy
score-ordered matching per (image, category) at IoU thresholds .5:.05:.95,
crowd/ignore handling, 101-point interpolated AP, area ranges and maxDets —
reporting the standard 12 metrics.

Detections: list of dicts {image_id, category_id, bbox [x,y,w,h], score,
(segmentation: binary mask for segm)}. Ground truth: a COCO-style dict or
path (images/annotations/categories).
"""
import json

import numpy as np

IOU_THRS = np.linspace(0.5, 0.95, 10)
REC_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNG = {
    "all": (0.0, 1e10),
    "small": (0.0, 32.0 ** 2),
    "medium": (32.0 ** 2, 96.0 ** 2),
    "large": (96.0 ** 2, 1e10),
}
MAX_DETS = (1, 10, 100)


def box_iou_xywh(dt, gt, iscrowd):
    """COCO maskUtils.iou semantics for boxes: xywh, no +1; crowd gt uses
    intersection / det area."""
    dt = np.asarray(dt, np.float64).reshape(-1, 4)
    gt = np.asarray(gt, np.float64).reshape(-1, 4)
    ious = np.zeros((len(dt), len(gt)))
    for j, g in enumerate(gt):
        gx1, gy1, gw, gh = g
        garea = gw * gh
        for i, d in enumerate(dt):
            dx1, dy1, dw, dh = d
            iw = min(dx1 + dw, gx1 + gw) - max(dx1, gx1)
            if iw <= 0:
                continue
            ih = min(dy1 + dh, gy1 + gh) - max(dy1, gy1)
            if ih <= 0:
                continue
            inter = iw * ih
            union = dw * dh if iscrowd[j] else dw * dh + garea - inter
            if union > 0:
                ious[i, j] = inter / union
    return ious


def mask_iou(dt_masks, gt_masks, iscrowd):
    ious = np.zeros((len(dt_masks), len(gt_masks)))
    for j, g in enumerate(gt_masks):
        g = g.astype(bool)
        ga = g.sum()
        for i, d in enumerate(dt_masks):
            d = d.astype(bool)
            inter = np.logical_and(d, g).sum()
            union = d.sum() if iscrowd[j] else d.sum() + ga - inter
            if union > 0:
                ious[i, j] = inter / union
    return ious


class COCOEval:
    def __init__(self, gt, iou_type="bbox"):
        """gt: COCO dict or json path."""
        if isinstance(gt, str):
            with open(gt) as f:
                gt = json.load(f)
        self.iou_type = iou_type
        self.img_ids = [im["id"] for im in gt["images"]]
        self.cat_ids = sorted(c["id"] for c in gt["categories"])
        self.gts = {}
        for a in gt.get("annotations", []):
            area = a.get("area", a["bbox"][2] * a["bbox"][3])
            self.gts.setdefault((a["image_id"], a["category_id"]), []).append({
                "bbox": a["bbox"],
                "area": area,
                "iscrowd": a.get("iscrowd", 0),
                "segmentation": a.get("segmentation"),
                "_mask": a.get("_mask"),  # optional precomputed binary mask
            })

    def evaluate(self, detections):
        dts = {}
        for d in detections:
            dts.setdefault((d["image_id"], d["category_id"]), []).append(d)

        T, K, A, M = len(IOU_THRS), len(self.cat_ids), len(AREA_RNG), len(MAX_DETS)
        # per-(img,cat) match records
        eval_imgs = {}
        for k, cat in enumerate(self.cat_ids):
            for img in self.img_ids:
                gt = self.gts.get((img, cat), [])
                dt = sorted(dts.get((img, cat), []),
                            key=lambda x: -x["score"])[:max(MAX_DETS)]
                if not gt and not dt:
                    continue
                iscrowd = [g["iscrowd"] for g in gt]
                if self.iou_type == "bbox":
                    ious = box_iou_xywh([d["bbox"] for d in dt],
                                        [g["bbox"] for g in gt], iscrowd)
                else:
                    ious = mask_iou([d["_mask"] for d in dt],
                                    [g["_mask"] for g in gt], iscrowd)
                eval_imgs[(img, cat)] = (dt, gt, ious)

        # accumulate precision/recall
        precision = -np.ones((T, len(REC_THRS), K, A, M))
        recall = -np.ones((T, K, A, M))
        for k, cat in enumerate(self.cat_ids):
            for a, (aname, rng) in enumerate(AREA_RNG.items()):
                for m, max_det in enumerate(MAX_DETS):
                    scores_all, matches_all, n_gt = [], [], 0
                    for img in self.img_ids:
                        rec = eval_imgs.get((img, cat))
                        if rec is None:
                            continue
                        dt, gt, ious = rec
                        dt = dt[:max_det]
                        g_ignore = np.array(
                            [bool(g["iscrowd"]) or g["area"] < rng[0]
                             or g["area"] > rng[1] for g in gt], bool)
                        n_gt += int((~g_ignore).sum())
                        # match order: non-ignored gts first
                        gt_order = np.argsort(g_ignore, kind="stable")
                        gtm = np.full(len(gt), -1)
                        dt_match = np.zeros((T, len(dt)), dtype=np.int64)
                        dt_ignore = np.zeros((T, len(dt)), dtype=bool)
                        for t, thr in enumerate(IOU_THRS):
                            gtm[:] = -1
                            for di, d in enumerate(dt):
                                best, best_iou = -1, min(thr, 1 - 1e-10)
                                for gi in gt_order:
                                    if gtm[gi] >= 0 and not gt[gi]["iscrowd"]:
                                        continue
                                    # stop at ignored gts once a real match found
                                    if best >= 0 and not g_ignore[best] \
                                            and g_ignore[gi]:
                                        break
                                    if ious[di, gi] < best_iou:
                                        continue
                                    best_iou = ious[di, gi]
                                    best = gi
                                if best >= 0:
                                    gtm[best] = di
                                    dt_match[t, di] = 1
                                    dt_ignore[t, di] = g_ignore[best]
                        # dets outside the area range and unmatched -> ignore
                        d_area_out = np.array(
                            [d["bbox"][2] * d["bbox"][3] < rng[0]
                             or d["bbox"][2] * d["bbox"][3] > rng[1]
                             for d in dt], bool)
                        dt_ignore |= (~dt_match.astype(bool)) & d_area_out[None, :]
                        scores_all.append([d["score"] for d in dt])
                        matches_all.append((dt_match, dt_ignore))

                    if n_gt == 0:
                        continue
                    if scores_all:
                        scores = np.concatenate(
                            [np.asarray(s) for s in scores_all])
                        order = np.argsort(-scores, kind="mergesort")
                        tps = np.concatenate(
                            [m[0] for m in matches_all], axis=1)[:, order]
                        ign = np.concatenate(
                            [m[1] for m in matches_all], axis=1)[:, order]
                    else:
                        tps = np.zeros((T, 0), np.int64)
                        ign = np.zeros((T, 0), bool)
                    tp = (tps == 1) & ~ign
                    fp = (tps == 0) & ~ign
                    tp_cum = np.cumsum(tp, axis=1).astype(np.float64)
                    fp_cum = np.cumsum(fp, axis=1).astype(np.float64)
                    for t in range(T):
                        rc = tp_cum[t] / n_gt
                        pr = tp_cum[t] / np.maximum(tp_cum[t] + fp_cum[t], 1e-12)
                        recall[t, k, a, m] = rc[-1] if len(rc) else 0.0
                        # precision envelope (monotone decreasing)
                        pr = pr.tolist()
                        for i in range(len(pr) - 1, 0, -1):
                            pr[i - 1] = max(pr[i - 1], pr[i])
                        inds = np.searchsorted(rc, REC_THRS, side="left")
                        q = np.zeros(len(REC_THRS))
                        for ri, pi in enumerate(inds):
                            if pi < len(pr):
                                q[ri] = pr[pi]
                        precision[t, :, k, a, m] = q

        self.precision = precision
        self.recall = recall
        return self.summarize()

    def _ap(self, iou_thr=None, area="all", max_det=100):
        a = list(AREA_RNG).index(area)
        m = MAX_DETS.index(max_det)
        p = self.precision
        if iou_thr is not None:
            t = int(np.argmin(np.abs(IOU_THRS - iou_thr)))
            p = p[t:t + 1]
        p = p[:, :, :, a, m]
        valid = p > -1
        return float(p[valid].mean()) if valid.any() else -1.0

    def _ar(self, area="all", max_det=100):
        a = list(AREA_RNG).index(area)
        m = MAX_DETS.index(max_det)
        r = self.recall[:, :, a, m]
        valid = r > -1
        return float(r[valid].mean()) if valid.any() else -1.0

    def summarize(self, logger=None):
        s = {
            "AP": self._ap(),
            "AP50": self._ap(iou_thr=0.5),
            "AP75": self._ap(iou_thr=0.75),
            "APs": self._ap(area="small"),
            "APm": self._ap(area="medium"),
            "APl": self._ap(area="large"),
            "AR1": self._ar(max_det=1),
            "AR10": self._ar(max_det=10),
            "AR100": self._ar(max_det=100),
            "ARs": self._ar(area="small"),
            "ARm": self._ar(area="medium"),
            "ARl": self._ar(area="large"),
        }
        lines = [
            f" Average Precision  (AP) @[ IoU=0.50:0.95 | area=   all | maxDets=100 ] = {s['AP']:.3f}",
            f" Average Precision  (AP) @[ IoU=0.50      | area=   all | maxDets=100 ] = {s['AP50']:.3f}",
            f" Average Precision  (AP) @[ IoU=0.75      | area=   all | maxDets=100 ] = {s['AP75']:.3f}",
            f" Average Precision  (AP) @[ IoU=0.50:0.95 | area= small | maxDets=100 ] = {s['APs']:.3f}",
            f" Average Precision  (AP) @[ IoU=0.50:0.95 | area=medium | maxDets=100 ] = {s['APm']:.3f}",
            f" Average Precision  (AP) @[ IoU=0.50:0.95 | area= large | maxDets=100 ] = {s['APl']:.3f}",
            f" Average Recall     (AR) @[ IoU=0.50:0.95 | area=   all | maxDets=  1 ] = {s['AR1']:.3f}",
            f" Average Recall     (AR) @[ IoU=0.50:0.95 | area=   all | maxDets= 10 ] = {s['AR10']:.3f}",
            f" Average Recall     (AR) @[ IoU=0.50:0.95 | area=   all | maxDets=100 ] = {s['AR100']:.3f}",
            f" Average Recall     (AR) @[ IoU=0.50:0.95 | area= small | maxDets=100 ] = {s['ARs']:.3f}",
            f" Average Recall     (AR) @[ IoU=0.50:0.95 | area=medium | maxDets=100 ] = {s['ARm']:.3f}",
            f" Average Recall     (AR) @[ IoU=0.50:0.95 | area= large | maxDets=100 ] = {s['ARl']:.3f}",
        ]
        out = "\n".join(lines)
        if logger:
            logger.info("\n" + out)
        else:
            print(out)
        return s
