"""Batch visualizers — debug hooks for the input pipeline.

The reference ships loader visualizers (core/detection_input.py:870-894)
that draw a batch's images with their gt boxes to inspect augmentation and
target plumbing. Same idea here, for the collated numpy batches our Loader
emits (NHWC, possibly normalized) and for detection outputs.
"""
import os

import numpy as np


def _to_u8(img, mean=None, std=None):
    """Undo Norm2DImage if stats are given; clamp to displayable u8.
    uint8 batches (deferred normalization) are already displayable."""
    img = np.asarray(img)
    if img.dtype == np.uint8:
        return img
    img = img.astype(np.float32)
    if std is not None:
        img = img * np.asarray(std, np.float32)
    if mean is not None:
        img = img + np.asarray(mean, np.float32)
    if img.max() <= 1.5:  # [0,1]-scaled inputs
        img = img * 255.0
    return np.clip(img, 0, 255).astype(np.uint8)


def draw_boxes(img_u8, boxes, labels=None, color=(0, 255, 0), thickness=2):
    """Rectangle overlay; boxes xyxy, rows with all-nonpositive coords or
    class<=0 in col 4 (if present) are skipped like the loader's -1 pads."""
    import cv2
    out = np.ascontiguousarray(img_u8[..., ::-1])  # RGB -> BGR for cv2
    for i, box in enumerate(np.asarray(boxes)):
        cls = box[4] if box.shape[-1] > 4 else 1
        if cls <= 0 or box[2] <= box[0] or box[3] <= box[1]:
            continue
        x1, y1, x2, y2 = [int(round(float(v))) for v in box[:4]]
        cv2.rectangle(out, (x1, y1), (x2, y2), color, thickness)
        text = str(labels[i]) if labels is not None else str(int(cls))
        cv2.putText(out, text, (x1, max(y1 - 4, 10)),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.5, color, 1)
    return out[..., ::-1]


def visualize_batch(batch, out_dir, mean=None, std=None, prefix="batch"):
    """Write one PNG per image in a collated batch dict.

    batch: {"data": [B,H,W,3], "gt_bbox": [B,G,5], ...} as produced by
    data/loader.py. Returns the list of file paths written.
    """
    import cv2
    os.makedirs(out_dir, exist_ok=True)
    data = np.asarray(batch["data"])
    gt = np.asarray(batch.get("gt_bbox")) if "gt_bbox" in batch else None
    paths = []
    for b in range(data.shape[0]):
        img = _to_u8(data[b], mean, std)
        if gt is not None:
            img = draw_boxes(img, gt[b])
        path = os.path.join(out_dir, f"{prefix}_{b}.png")
        cv2.imwrite(path, np.ascontiguousarray(img[..., ::-1]))
        paths.append(path)
    return paths


def visualize_detections(image_u8, boxes, scores, classes, out_path,
                         score_thr=0.3, class_names=None):
    """Draw thresholded detections (xyxy + score + class id) onto an image."""
    import cv2
    keep = np.asarray(scores) >= score_thr
    boxes = np.asarray(boxes)[keep]
    labels = []
    for c, s in zip(np.asarray(classes)[keep], np.asarray(scores)[keep]):
        name = class_names[int(c)] if class_names else str(int(c))
        labels.append(f"{name}:{s:.2f}")
    img = draw_boxes(np.asarray(image_u8), boxes, labels, color=(255, 64, 0))
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    cv2.imwrite(out_path, np.ascontiguousarray(img[..., ::-1]))
    return out_path
