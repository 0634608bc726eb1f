"""Generic json -> roidb converter (reference utils/json_to_roidb.py).

Input: a json list of records {image_url, im_id, h, w, gt_class, gt_bbox}.
Usage: python utils/json_to_roidb.py --json <file.json> --save <name>
"""
import argparse
import json

from simpledet_tpu.data.roidb import save_roidb

if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", required=True)
    ap.add_argument("--save", required=True)
    ap.add_argument("--cache-dir", default="data/cache")
    args = ap.parse_args()
    with open(args.json) as f:
        roidb = json.load(f)
    for r in roidb:
        r.setdefault("flipped", False)
    save_roidb(roidb, args.save, cache_dir=args.cache_dir)
    print(f"wrote {len(roidb)} records to {args.cache_dir}/{args.save}.roidb")
