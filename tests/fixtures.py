"""Synthetic micro COCO dataset for end-to-end tests (the analog of the
reference's unittest/data/coco_micro_test.roidb fixture)."""
import json
import os

import numpy as np


def make_micro_dataset(root, n_images=8, seed=0,
                       set_names=("micro_train", "micro_val"),
                       shapes="rect"):
    """Writes jpgs + roidb pickles + a COCO annotation json under `root`.
    Returns (roidb_name, annotation_path). Images alternate orientation.

    shapes="ellipse" paints inscribed ellipses (16-gon polygons) instead
    of filled rectangles: segm IoU(ellipse, box) ~ pi/4 ~ 0.785, so a mask
    head that merely predicts "everything inside the box is foreground"
    caps out below segm AP75 — the overfit gate then tests real mask-shape
    learning, not box-filling."""
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
        boxes, classes, obj_polys = [], [], []
        for j in range(rng.randint(1, 4)):
            bw, bh = rng.randint(30, 80), rng.randint(30, 80)
            x1 = rng.randint(0, w - bw)
            y1 = rng.randint(0, h - bh)
            cls = int(rng.randint(1, 4))
            color = [(255, 64, 64), (64, 255, 64), (64, 64, 255)][cls - 1]
            x2, y2 = x1 + bw - 1, y1 + bh - 1
            if shapes == "ellipse":
                cx, cy = (x1 + x2) / 2.0, (y1 + y2) / 2.0
                rx, ry = (x2 - x1) / 2.0, (y2 - y1) / 2.0
                t = np.linspace(0, 2 * np.pi, 16, endpoint=False)
                vx = cx + rx * np.cos(t)
                vy = cy + ry * np.sin(t)
                poly = np.stack([vx, vy], 1)
                cv2.fillPoly(img, [np.round(poly).astype(np.int32)], color)
                obj_polys.append([float(v) for v in poly.reshape(-1)])
            else:
                cv2.rectangle(img, (x1, y1), (x1 + bw, y1 + bh), color, -1)
                obj_polys.append(None)
            boxes.append([x1, y1, x2, y2])
            classes.append(cls)
        path = os.path.join(img_dir, f"im{i}.jpg")
        cv2.imwrite(path, img[:, :, ::-1])
        images.append({"id": i + 1, "file_name": f"im{i}.jpg",
                       "height": h, "width": w})
        polys = []
        for b, c, op in zip(boxes, classes, obj_polys):
            x1, y1, x2, y2 = b
            if op is not None:
                poly = op
            else:
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


def make_identical_dataset(root, n_images=32,
                           set_names=("micro_train", "micro_val")):
    """All-identical, horizontally-symmetric 128x192 PNG images with one
    centered gt box (x1+x2 = w-1), for the 2-process distributed test:
    flip duplication and any batch composition produce positionally
    identical global batches, so single- vs multi-process losses must
    match exactly. PNG (lossless) keeps the mirror pixel-exact — JPEG DCT
    would break flip-invariance."""
    import cv2

    from simpledet_tpu.data.roidb import save_roidb

    rng = np.random.RandomState(11)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)

    h, w = 128, 192
    left = rng.randint(0, 80, (h, w // 2, 3), np.uint8)
    img = np.concatenate([left, left[:, ::-1]], axis=1)
    x1, y1, x2, y2 = 64, 30, 127, 93          # x1 + x2 == w - 1
    cv2.rectangle(img, (x1, y1), (x2, y2), (255, 64, 64), -1)
    path = os.path.join(img_dir, "im.png")
    cv2.imwrite(path, img[:, :, ::-1])

    images, annotations, roidb = [], [], []
    for i in range(n_images):
        images.append({"id": i + 1, "file_name": "im.png",
                       "height": h, "width": w})
        annotations.append({
            "id": i + 1, "image_id": i + 1, "category_id": 1,
            "bbox": [x1, y1, x2 - x1 + 1, y2 - y1 + 1],
            "area": (x2 - x1 + 1) * (y2 - y1 + 1), "iscrowd": 0,
            "segmentation": [[float(x1), float(y1), float(x2), float(y1),
                              float(x2), float(y2), float(x1), float(y2)]],
        })
        roidb.append({
            "image_url": path, "im_id": i + 1, "h": h, "w": w,
            "gt_class": [1],
            "gt_bbox": [[float(x1), float(y1), float(x2), float(y2)]],
            "gt_poly": [[annotations[-1]["segmentation"][0]]],
            "flipped": False,
        })

    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": c, "name": f"class{c}"} for c in (1, 2, 3)]}
    ann_path = os.path.join(root, "annotations.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    cache = os.path.join(root, "cache")
    for name in set_names:
        save_roidb(roidb, name, cache)
    return roidb, ann_path


def make_crowd_dataset(root, n_images=16, seed=5,
                       set_names=("converge_train",)):
    """Crowd-overlap synthetic set for the set-NMS/EMD effectiveness gate:
    every image holds PAIRS of same-class boxes at IoU ~0.6 (above the 0.5
    NMS threshold), so vanilla per-class NMS caps recall at one box per
    pair while set-NMS (double-pred sets) can keep both — the measurable
    delta the gate asserts (reference operator_py/nms.py:77-107 set_nms,
    models/crowdhuman EMD double prediction)."""
    import cv2

    from simpledet_tpu.data.roidb import save_roidb

    rng = np.random.RandomState(seed)
    img_dir = os.path.join(root, "images")
    os.makedirs(img_dir, exist_ok=True)

    images, annotations, roidb = [], [], []
    ann_id = 1
    for i in range(n_images):
        h, w = (160, 224) if i % 2 == 0 else (224, 160)
        img = rng.randint(0, 60, (h, w, 3), np.uint8)
        boxes = []
        for j in range(2):
            bw, bh = rng.randint(40, 64), rng.randint(40, 64)
            dx = int(bw * 0.25)          # IoU(A, B) = 0.75/1.25 = 0.6
            x1 = rng.randint(0, w - bw - dx - 1)
            y1 = rng.randint(0, h - bh - 1)
            a = [x1, y1, x1 + bw - 1, y1 + bh - 1]
            b = [x1 + dx, y1, x1 + dx + bw - 1, y1 + bh - 1]
            cv2.rectangle(img, (a[0], a[1]), (a[2], a[3]), (255, 64, 64), -1)
            # partial occlusion keeps both instances visible
            cv2.rectangle(img, (b[0], b[1]), (b[2], b[3]), (64, 255, 64), 2)
            cv2.rectangle(img, (a[2], b[1]), (b[2], b[3]), (64, 255, 64), -1)
            boxes += [a, b]
        path = os.path.join(img_dir, f"crowd{i}.png")
        cv2.imwrite(path, img[:, :, ::-1])
        images.append({"id": i + 1, "file_name": f"crowd{i}.png",
                       "height": h, "width": w})
        for bx in boxes:
            x1, y1, x2, y2 = bx
            annotations.append({
                "id": ann_id, "image_id": i + 1, "category_id": 1,
                "bbox": [x1, y1, x2 - x1 + 1, y2 - y1 + 1],
                "area": (x2 - x1 + 1) * (y2 - y1 + 1), "iscrowd": 0,
                "segmentation": [[float(x1), float(y1), float(x2), float(y1),
                                  float(x2), float(y2), float(x1),
                                  float(y2)]],
            })
            ann_id += 1
        roidb.append({
            "image_url": path, "im_id": i + 1, "h": h, "w": w,
            "gt_class": [1] * len(boxes),
            "gt_bbox": [[float(v) for v in b] for b in boxes],
            "gt_poly": [[[float(b[0]), float(b[1]), float(b[2]), float(b[1]),
                          float(b[2]), float(b[3]), float(b[0]),
                          float(b[3])]] for b in boxes],
            "flipped": False,
        })

    ann = {"images": images, "annotations": annotations,
           "categories": [{"id": 1, "name": "person"}]}
    ann_path = os.path.join(root, "annotations.json")
    with open(ann_path, "w") as f:
        json.dump(ann, f)
    cache = os.path.join(root, "cache")
    for name in set_names:
        save_roidb(roidb, name, cache)
    return roidb, ann_path
