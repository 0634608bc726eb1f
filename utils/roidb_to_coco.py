"""Synthesize a COCO annotation dict from a roidb (reference
utils/roidb_to_coco.py:8) so custom datasets can use the COCO evaluator."""


def roidb_to_coco(roidb, num_class=None):
    images, annotations = [], []
    cats = set()
    ann_id = 1
    for r in roidb:
        images.append({"id": r["im_id"], "file_name": r.get("image_url", ""),
                       "height": r["h"], "width": r["w"]})
        for cls, box in zip(r.get("gt_class", []), r.get("gt_bbox", [])):
            x1, y1, x2, y2 = box
            cats.add(int(cls))
            annotations.append({
                "id": ann_id, "image_id": r["im_id"],
                "category_id": int(cls),
                "bbox": [x1, y1, x2 - x1 + 1, y2 - y1 + 1],
                "area": (x2 - x1 + 1) * (y2 - y1 + 1), "iscrowd": 0,
            })
            ann_id += 1
    if num_class:
        cats = range(1, num_class + 1)
    return {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": c, "name": str(c)} for c in sorted(cats)],
    }
