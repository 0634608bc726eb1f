"""Synthetic micro COCO dataset for end-to-end tests (the analog of the
reference's unittest/data/coco_micro_test.roidb fixture)."""
import json
import os

import numpy as np


def make_micro_dataset(root, n_images=8, seed=0,
                       set_names=("micro_train", "micro_val")):
    """Writes jpgs + roidb pickles + a COCO annotation json under `root`.
    Returns (roidb_name, annotation_path). Images alternate orientation."""
    import cv2

    from simpledet_tpu.data.roidb import save_roidb

    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)

    images, annotations, roidb = [], [], []
    ann_id = 1
    for i in range(n_images):
        if i % 2 == 0:
            h, w = 160, 224
        else:
            h, w = 224, 160
        img = rng.randint(0, 80, (h, w, 3), np.uint8)
        boxes, classes = [], []
        for j in range(rng.randint(1, 4)):
            bw, bh = rng.randint(30, 80), rng.randint(30, 80)
            x1 = rng.randint(0, w - bw)
            y1 = rng.randint(0, h - bh)
            cls = int(rng.randint(1, 4))
            color = [(255, 64, 64), (64, 255, 64), (64, 64, 255)][cls - 1]
            cv2.rectangle(img, (x1, y1), (x1 + bw, y1 + bh), color, -1)
            boxes.append([x1, y1, x1 + bw - 1, y1 + bh - 1])
            classes.append(cls)
        path = os.path.join(img_dir, f"im{i}.jpg")
        cv2.imwrite(path, img[:, :, ::-1])
        images.append({"id": i + 1, "file_name": f"im{i}.jpg",
                       "height": h, "width": w})
        polys = []
        for b, c in zip(boxes, classes):
            x1, y1, x2, y2 = b
            # rectangle polygon matching the painted box (xy interleaved)
            poly = [float(x1), float(y1), float(x2), float(y1),
                    float(x2), float(y2), float(x1), float(y2)]
            polys.append([poly])
            annotations.append({
                "id": ann_id, "image_id": i + 1, "category_id": c,
                "bbox": [x1, y1, x2 - x1 + 1, y2 - y1 + 1],
                "area": (x2 - x1 + 1) * (y2 - y1 + 1), "iscrowd": 0,
                "segmentation": [poly],
            })
            ann_id += 1
        roidb.append({
            "image_url": path, "im_id": i + 1, "h": h, "w": w,
            "gt_class": classes,
            "gt_bbox": [[float(v) for v in b] for b in boxes],
            "gt_poly": polys,
            "flipped": False,
        })

    ann = {
        "images": images,
        "annotations": annotations,
        "categories": [{"id": c, "name": f"class{c}"} for c in (1, 2, 3)],
    }
    ann_path = os.path.join(root, "annotations.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    for name in set_names:
        save_roidb(roidb, name, cache_dir=os.path.join(root, "cache"))
    return roidb, ann_path
