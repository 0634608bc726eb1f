"""Host-side augmentation pipeline — composable record transforms.

Mirrors the reference DetectionAugmentation classes
(core/detection_input.py:14-351): each transform mutates a record dict.
Records carry numpy arrays; images stay HWC (NHWC on device — no
ConvertImageFromHwcToChw needed; a no-op shim is provided for ported
configs).

Record keys: image [H,W,3] float32 RGB, gt_bbox [G,5] (xyxy+class, -1
padded), im_info [h', w', scale], h, w, im_id, rec_id, flipped.
"""
import numpy as np

try:
    import cv2
except ImportError:  # pragma: no cover
    cv2 = None


class DetectionAugmentation:
    """Base class for record transforms (core/detection_input.py:14-20).

    dtype contract: with the default deferred Norm2DImage, ``r['image']``
    stays **uint8** through the whole chain (float conversion happens on
    device, ops/image.py::device_normalize). Every in-repo transform is
    dtype-preserving. A custom transform doing float arithmetic on the
    pixels (e.g. brightness jitter) must convert first —
    ``img.astype(np.float32)`` — or its math wraps around in uint8; once
    the image is float, Norm2DImage automatically falls back to host
    normalization, so converting is always safe.
    """

    def apply(self, record):
        raise NotImplementedError


class ReadRoiRecord(DetectionAugmentation):
    """cv2.imread BGR -> RGB float32 (core/detection_input.py:22-45); also
    materializes gt arrays from the roidb lists."""

    def __init__(self, gt_select=None):
        self.gt_select = gt_select

    def apply(self, r):
        img = cv2.imread(r["image_url"], cv2.IMREAD_COLOR)
        if img is None:
            raise IOError(f"cannot read {r['image_url']}")
        # stay uint8: Norm2DImage defers the float conversion to the device
        # by default, and every transform below is dtype-preserving. SIMD
        # cvtColor instead of a negative-stride ::-1 view keeps downstream
        # cv2/np ops on contiguous memory.
        r["image"] = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
        r["gt_bbox"] = np.asarray(r.get("gt_bbox", []),
                                  np.float32).reshape(-1, 4)
        r["gt_class"] = np.asarray(r.get("gt_class", []),
                                   np.float32).reshape(-1)
        return r


class Norm2DImage(DetectionAugmentation):
    """Pixel normalization (core/detection_input.py:48-66).

    By default this is DEFERRED: the host pipeline keeps uint8 pixels (4x
    smaller collation + H2D) and the CLIs fuse (x - mean) / std into the
    jitted step via ops/image.py::device_normalize — see that module for
    the semantics argument. Set SIMPLEDET_HOST_NORM=1 (or host=True) to
    normalize on the host like the reference; that path is also taken
    automatically when the image is already float (custom chains).
    """

    def __init__(self, pNorm, host=None):
        import os
        self.mean = np.asarray(pNorm.mean, np.float32)
        self.std = np.asarray(pNorm.std, np.float32)
        if host is None:
            host = os.environ.get("SIMPLEDET_HOST_NORM") == "1"
        self.deferred = not host

    def apply(self, r):
        img = r["image"]
        if self.deferred and img.dtype == np.uint8:
            return r  # device_normalize handles it inside the step
        img = np.asarray(img, np.float32)
        np.subtract(img, self.mean, out=img)
        if not np.all(self.std == 1.0):
            np.divide(img, self.std, out=img)
        r["image"] = img
        return r


def _scale_clip_gt(gt_bbox, scale, nh, nw):
    """Scale gt coords and clip them to the resized image, like the
    reference's "make sure gt boxes do not overflow"
    (core/detection_input.py:94-96)."""
    gt = gt_bbox.astype(np.float32, copy=True)
    gt[:, :4] *= scale
    gt[:, [0, 2]] = np.clip(gt[:, [0, 2]], 0, nw - 1)
    gt[:, [1, 3]] = np.clip(gt[:, [1, 3]], 0, nh - 1)
    return gt


class Resize2DImageBbox(DetectionAugmentation):
    """Aspect-preserving short/long-side resize; writes im_info=[h',w',scale]
    (core/detection_input.py:69-103) and scales + clips gt boxes."""

    def __init__(self, pResize):
        self.short = pResize.short
        self.long = pResize.long

    def apply(self, r):
        img = r["image"]
        h, w = img.shape[:2]
        scale = min(self.short / min(h, w), self.long / max(h, w))
        nh, nw = int(round(h * scale)), int(round(w * scale))
        r["image"] = cv2.resize(img, (nw, nh),
                                interpolation=cv2.INTER_LINEAR)
        if len(r["gt_bbox"]):
            r["gt_bbox"] = _scale_clip_gt(r["gt_bbox"], scale, nh, nw)
        r["im_info"] = np.array([nh, nw, scale], np.float32)
        return r


class RandResize2DImageBbox(DetectionAugmentation):
    """Multi-scale train resize: pick a (short, long) pair per record
    (core/detection_input.py:158-181)."""

    def __init__(self, pResize):
        self.scales = list(zip(pResize.short, pResize.long))

    def apply(self, r):
        short, long_ = self.scales[np.random.randint(len(self.scales))]
        img = r["image"]
        h, w = img.shape[:2]
        scale = min(short / min(h, w), long_ / max(h, w))
        nh, nw = int(round(h * scale)), int(round(w * scale))
        r["image"] = cv2.resize(img, (nw, nh),
                                interpolation=cv2.INTER_LINEAR)
        if len(r["gt_bbox"]):
            r["gt_bbox"] = _scale_clip_gt(r["gt_bbox"], scale, nh, nw)
        r["im_info"] = np.array([nh, nw, scale], np.float32)
        return r


class Flip2DImageBbox(DetectionAugmentation):
    """Horizontal flip when record['flipped'] (core/detection_input.py:184-205)."""

    def apply(self, r):
        if r.get("flipped"):
            img = r["image"]
            w = img.shape[1]
            r["image"] = img[:, ::-1]
            if len(r["gt_bbox"]):
                bb = r["gt_bbox"].copy()
                x1 = bb[:, 0].copy()
                bb[:, 0] = w - 1 - bb[:, 2]
                bb[:, 2] = w - 1 - x1
                r["gt_bbox"] = bb
        return r


class Pad2DImageBbox(DetectionAugmentation):
    """Pad image to the fixed batch shape — (long, short) or (short, long)
    by orientation — and gt to max_num_gt with -1
    (core/detection_input.py:285-315). Appends class to gt_bbox column 4."""

    def __init__(self, pPad):
        self.short = pPad.short
        self.long = pPad.long
        self.max_num_gt = pPad.max_num_gt

    def apply(self, r):
        img = r["image"]
        h, w = img.shape[:2]
        if h >= w:
            ph, pw = self.long, self.short
        else:
            ph, pw = self.short, self.long
        out = np.zeros((ph, pw, 3), img.dtype)
        out[:h, :w] = img
        r["image"] = out

        gt = np.full((self.max_num_gt, 5), -1, np.float32)
        n = min(len(r["gt_bbox"]), self.max_num_gt)
        if n:
            gt[:n, :4] = r["gt_bbox"][:n]
            gt[:n, 4] = r["gt_class"][:n]
        r["gt_bbox"] = gt
        return r


class ConvertImageFromHwcToChw(DetectionAugmentation):
    """No-op: TPU pipeline is NHWC end-to-end. Kept so reference configs
    port unchanged."""

    def apply(self, r):
        return r


class RenameRecord(DetectionAugmentation):
    def __init__(self, mapping):
        self.mapping = mapping

    def apply(self, r):
        for old, new in self.mapping.items():
            if old in r:
                r[new] = r.pop(old)
        return r


def apply_transforms(record, transforms):
    for t in transforms:
        t.apply(record)
    return record


class RandCrop2DImageBbox(DetectionAugmentation):
    """Crop to (short, long) by orientation, 'center' (around a random gt
    with jitter) or 'random' placement; gt outside the crop dropped
    (reference core/detection_input.py:208-283)."""

    def __init__(self, pCrop):
        assert pCrop.mode in ("center", "random")
        self.short = pCrop.short
        self.long = pCrop.long
        self.mode = pCrop.mode

    def apply(self, r):
        img = r["image"]
        gt = np.asarray(r["gt_bbox"], np.float32).reshape(-1, 4)
        if img.shape[0] >= img.shape[1]:
            crop_w, crop_h = self.short, self.long
        else:
            crop_w, crop_h = self.long, self.short
        crop_w = min(crop_w, img.shape[1])
        crop_h = min(crop_h, img.shape[0])

        if self.mode == "center" and len(gt) > 0:
            box = gt[np.random.randint(len(gt))]
            ctr_x = (box[2] + box[0]) / 2.0
            ctr_y = (box[3] + box[1]) / 2.0
            start_h = int(round(ctr_y - crop_h / 2)) + np.random.randint(-10, 10)
            start_w = int(round(ctr_x - crop_w / 2)) + np.random.randint(-30, 30)
            start_h = int(np.clip(start_h, 0, img.shape[0] - crop_h))
            start_w = int(np.clip(start_w, 0, img.shape[1] - crop_w))
        else:
            start_h = np.random.randint(0, img.shape[0] - crop_h + 1)
            start_w = np.random.randint(0, img.shape[1] - crop_w + 1)
        end_h, end_w = start_h + crop_h, start_w + crop_w

        r["image"] = img[start_h:end_h, start_w:end_w]
        if len(gt):
            cx = (gt[:, 2] + gt[:, 0]) / 2.0
            cy = (gt[:, 3] + gt[:, 1]) / 2.0
            keep = (cy > start_h) & (cx > start_w) & (cy < end_h) & (cx < end_w)
            gt = gt[keep]
            cls = np.asarray(r["gt_class"], np.float32).reshape(-1)[keep]
            gt[:, [0, 2]] = np.clip(gt[:, [0, 2]] - start_w, 0, crop_w - 1)
            gt[:, [1, 3]] = np.clip(gt[:, [1, 3]] - start_h, 0, crop_h - 1)
            r["gt_bbox"] = gt
            r["gt_class"] = cls
        return r


class Resize2DImage(DetectionAugmentation):
    """Image-only short/long resize (reference core/detection_input.py:105)."""

    def __init__(self, pResize):
        self.short = pResize.short
        self.long = pResize.long

    def apply(self, r):
        import cv2
        img = r["image"]
        h, w = img.shape[:2]
        scale = min(self.short / min(h, w), self.long / max(h, w))
        nh, nw = int(round(h * scale)), int(round(w * scale))
        r["image"] = cv2.resize(img, (nw, nh),
                                interpolation=cv2.INTER_LINEAR)
        r["im_info"] = np.array([nh, nw, scale], np.float32)
        return r


class Resize2DImageByRoidb(DetectionAugmentation):
    """Resize to a per-record scale stored on the roidb entry (reference
    core/detection_input.py:135, multi-scale test pipelines)."""

    def apply(self, r):
        import cv2
        img = r["image"]
        scale = float(r.get("resize_scale", 1.0))
        h, w = img.shape[:2]
        nh, nw = int(round(h * scale)), int(round(w * scale))
        r["image"] = cv2.resize(img, (nw, nh),
                                interpolation=cv2.INTER_LINEAR)
        if len(r.get("gt_bbox", [])):
            r["gt_bbox"] = np.asarray(r["gt_bbox"], np.float32) * scale
        r["im_info"] = np.array([nh, nw, scale], np.float32)
        return r


class Pad2DImage(DetectionAugmentation):
    """Image-only fixed-shape pad (reference core/detection_input.py:317)."""

    def __init__(self, pPad):
        self.short = pPad.short
        self.long = pPad.long

    def apply(self, r):
        img = r["image"]
        h, w = img.shape[:2]
        ph, pw = (self.long, self.short) if h >= w else (self.short, self.long)
        out = np.zeros((ph, pw, 3), img.dtype)
        out[:h, :w] = img
        r["image"] = out
        return r
