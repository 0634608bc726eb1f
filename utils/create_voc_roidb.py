"""PASCAL VOC -> roidb cache (reference utils/create_voc_roidb.py).

Parses Annotations/*.xml for a given ImageSets split.
Usage: python utils/create_voc_roidb.py --voc-root VOCdevkit/VOC2007 \
           --split trainval --save voc2007_trainval
"""
import argparse
import os
import xml.etree.ElementTree as ET

VOC_CLASSES = (
    "aeroplane", "bicycle", "bird", "boat", "bottle", "bus", "car", "cat",
    "chair", "cow", "diningtable", "dog", "horse", "motorbike", "person",
    "pottedplant", "sheep", "sofa", "train", "tvmonitor")


def parse_voc_xml(path, cls_to_id, keep_difficult=False):
    root = ET.parse(path).getroot()
    size = root.find("size")
    h = int(size.find("height").text)
    w = int(size.find("width").text)
    gt_class, gt_bbox = [], []
    for obj in root.findall("object"):
        if not keep_difficult and obj.find("difficult") is not None \
                and int(obj.find("difficult").text):
            continue
        name = obj.find("name").text.strip().lower()
        if name not in cls_to_id:
            continue
        bb = obj.find("bndbox")
        # VOC is 1-indexed
        x1 = float(bb.find("xmin").text) - 1
        y1 = float(bb.find("ymin").text) - 1
        x2 = float(bb.find("xmax").text) - 1
        y2 = float(bb.find("ymax").text) - 1
        gt_class.append(cls_to_id[name])
        gt_bbox.append([x1, y1, x2, y2])
    return h, w, gt_class, gt_bbox


def create_voc_roidb(voc_root, split, keep_difficult=False):
    cls_to_id = {c: i + 1 for i, c in enumerate(VOC_CLASSES)}
    with open(os.path.join(voc_root, "ImageSets", "Main",
                           split + ".txt")) as f:
        ids = [line.strip().split()[0] for line in f if line.strip()]
    roidb = []
    for i, img_id in enumerate(ids):
        xml = os.path.join(voc_root, "Annotations", img_id + ".xml")
        h, w, gt_class, gt_bbox = parse_voc_xml(xml, cls_to_id,
                                                keep_difficult)
        roidb.append({
            "image_url": os.path.join(voc_root, "JPEGImages",
                                      img_id + ".jpg"),
            "im_id": i + 1, "h": h, "w": w,
            "gt_class": gt_class, "gt_bbox": gt_bbox, "flipped": False,
        })
    return roidb


if __name__ == "__main__":
    from simpledet_tpu.data.roidb import save_roidb

    ap = argparse.ArgumentParser()
    ap.add_argument("--voc-root", required=True)
    ap.add_argument("--split", default="trainval")
    ap.add_argument("--save", required=True)
    ap.add_argument("--cache-dir", default="data/cache")
    ap.add_argument("--keep-difficult", action="store_true")
    args = ap.parse_args()
    roidb = create_voc_roidb(args.voc_root, args.split, args.keep_difficult)
    save_roidb(roidb, args.save, cache_dir=args.cache_dir)
    print(f"wrote {len(roidb)} records to {args.cache_dir}/{args.save}.roidb")
