"""CrowdHuman .odgt -> roidb cache (reference utils/create_crowdhuman_roidb.py).

Each odgt line: {"ID", "gtboxes": [{"tag", "fbox" or "vbox"/"hbox", "extra"}]}.
Full-body boxes (fbox) become class 1; ignore boxes are dropped.
Usage: python utils/create_crowdhuman_roidb.py --odgt annotation_train.odgt \
           --image-dir Images --save crowdhuman_train
"""
import argparse
import json
import os


def create_crowdhuman_roidb(odgt_path, image_dir, box_key="fbox"):
    roidb = []
    with open(odgt_path) as f:
        for i, line in enumerate(f):
            rec = json.loads(line)
            gt_bbox, gt_class = [], []
            for g in rec.get("gtboxes", []):
                if g.get("tag") != "person":
                    continue
                if g.get("extra", {}).get("ignore", 0):
                    continue
                x, y, w, h = g[box_key]
                if w <= 1 or h <= 1:
                    continue
                gt_bbox.append([x, y, x + w - 1, y + h - 1])
                gt_class.append(1)
            roidb.append({
                "image_url": os.path.join(image_dir, rec["ID"] + ".jpg"),
                "im_id": i + 1,
                # h/w filled lazily at load if unknown; CrowdHuman images are
                # variable-size so callers should run utils/fill_image_sizes
                "h": rec.get("height", 0), "w": rec.get("width", 0),
                "gt_class": gt_class, "gt_bbox": gt_bbox, "flipped": False,
            })
    return roidb


if __name__ == "__main__":
    from simpledet_tpu.data.roidb import save_roidb

    ap = argparse.ArgumentParser()
    ap.add_argument("--odgt", required=True)
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--save", required=True)
    ap.add_argument("--cache-dir", default="data/cache")
    ap.add_argument("--box-key", default="fbox")
    args = ap.parse_args()
    roidb = create_crowdhuman_roidb(args.odgt, args.image_dir, args.box_key)
    # fill missing sizes from the image files
    import cv2
    for r in roidb:
        if not r["h"]:
            img = cv2.imread(r["image_url"])
            if img is not None:
                r["h"], r["w"] = img.shape[:2]
    save_roidb(roidb, args.save, cache_dir=args.cache_dir)
    print(f"wrote {len(roidb)} records")
