"""COCO annotations -> roidb cache (reference utils/create_coco_roidb.py).

Usage: python utils/create_coco_roidb.py --annotation <instances.json> \
           --image-dir <dir> --save <name> [--with-poly]
Writes data/cache/<name>.roidb in the reference pickle schema.
"""
import argparse

from simpledet_tpu.data.roidb import create_coco_roidb, save_roidb

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--annotation", required=True)
    ap.add_argument("--image-dir", required=True)
    ap.add_argument("--save", required=True, help="dataset name, e.g. coco_train2017")
    ap.add_argument("--with-poly", action="store_true")
    ap.add_argument("--cache-dir", default="data/cache")
    args = ap.parse_args()
    roidb = create_coco_roidb(args.annotation, args.image_dir,
                              with_poly=args.with_poly)
    save_roidb(roidb, args.save, cache_dir=args.cache_dir)
    print(f"wrote {len(roidb)} records to {args.cache_dir}/{args.save}.roidb")
