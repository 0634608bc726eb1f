"""Instance-seg eval CLI: python mask_test.py --config config/<experiment>.py

The TPU rewrite of the reference mask_test.py: the test graph already runs
per-class NMS + the mask head in-graph (MaskFasterRcnn.get_test_symbol), so
the host only pastes the 28x28 masks back into image coordinates
(models/maskrcnn/utils.py segm_results) and runs bbox + segm COCO eval.
"""
import argparse
import json
import os
import time

import numpy as np


def mask_test_net(config_path, max_images=None):
    import jax
    from simpledet_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from models.maskrcnn.utils import segm_results
    from simpledet_tpu.core.checkpoint import (get_latest_ckpt_epoch,
                                               load_checkpoint)
    from simpledet_tpu.core.config import load_config, patch_all
    from simpledet_tpu.data.loader import Loader
    from simpledet_tpu.data.roidb import load_roidb
    from simpledet_tpu.eval.coco_eval import COCOEval
    from simpledet_tpu.utils.logger import config_logger

    cfg = load_config(config_path)
    (General, KvstoreParam, RpnParam, RoiParam, BboxParam, DatasetParam,
     ModelParam, OptimizeParam, TestParam, transform, data_name, label_name,
     metric_list) = cfg.get_config(is_train=False)
    (General, KvstoreParam, RpnParam, RoiParam, BboxParam, DatasetParam,
     ModelParam, OptimizeParam, TestParam) = patch_all(
        General, KvstoreParam, RpnParam, RoiParam, BboxParam, DatasetParam,
        ModelParam, OptimizeParam, TestParam)

    exp_dir = os.path.join("experiments", General.name)
    logger = config_logger(exp_dir)

    roidb = load_roidb(DatasetParam.image_set,
                       DatasetParam.cache_dir or "data/cache")
    roidb = TestParam.process_roidb(roidb)
    if max_images:
        roidb = roidb[:max_images]
    for i, r in enumerate(roidb):
        r["rec_id"] = i
    logger.info(f"evaluating {len(roidb)} images (bbox + segm)")

    model = ModelParam.test_symbol
    sample0 = next(iter(Loader([dict(roidb[0])], transform, 1, shuffle=False,
                               num_workers=0, keys=("data", "im_info"),
                               aspect_grouping=False)))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        jnp.asarray(sample0["data"]), jnp.asarray(sample0["im_info"]),
        mode="test")
    params = variables["params"]

    prefix = TestParam.model.prefix
    epoch = TestParam.model.epoch or get_latest_ckpt_epoch(prefix)
    batch_stats = None
    if epoch is not None and os.path.exists(f"{prefix}-{epoch:04d}.params"):
        params, _, _ = load_checkpoint(prefix, epoch, params)
        logger.info(f"loaded {prefix}-{epoch:04d}.params")
        if variables.get("batch_stats"):
            from simpledet_tpu.core.checkpoint import load_batch_stats
            batch_stats = load_batch_stats(prefix, epoch,
                                           variables["batch_stats"])
    else:
        logger.info("WARNING: no checkpoint found, using random params")

    # mesh-sharded eval (see detection_test.py: params replicated, batch
    # split along the data axis; the test graph is per-image so no
    # collectives appear). SIMPLEDET_EVAL_DEVICES caps the mesh.
    n_dev = len(jax.devices())
    cap = os.environ.get("SIMPLEDET_EVAL_DEVICES")
    if cap:
        n_dev = max(1, min(n_dev, int(cap)))
    mesh = None
    if n_dev > 1:
        from simpledet_tpu.parallel.mesh import (data_sharding, make_mesh,
                                                 replicated)
        mesh = make_mesh(jax.devices()[:n_dev])
        batch_sharding = data_sharding(mesh)
        logger.info(f"eval sharded over {n_dev} devices")

    # pin checkpoint-restored host numpy on device once (see detection_test)
    params = jax.device_put(params, replicated(mesh)) if mesh \
        else jax.device_put(params)
    if batch_stats is not None:
        batch_stats = jax.device_put(batch_stats, replicated(mesh)) \
            if mesh else jax.device_put(batch_stats)

    def _vars(p):
        return {"params": p, "batch_stats": batch_stats} if batch_stats \
            else {"params": p}

    from simpledet_tpu.ops.image import device_normalize, find_pixel_norm
    _pn = find_pixel_norm(transform)
    def _fwd(p, d, ii):
        if _pn is not None:
            d = device_normalize(d, ii, *_pn)
        return model.apply(_vars(p), d, ii, mode="test")
    fwd = jax.jit(_fwd)
    eval_batch = int(TestParam.batch_image or 1)
    if mesh is not None:
        eval_batch = -(-eval_batch // n_dev) * n_dev
    loader = Loader(roidb, transform, eval_batch, shuffle=False,
                    num_workers=4, keys=("data", "im_info", "im_id"),
                    pad_last=False, aspect_grouping=True)
    roidb_by_id = {r["im_id"]: r for r in roidb}

    detections = []
    t0 = time.time()
    n_done = 0
    for batch in loader:
        if mesh is not None:
            d = jax.device_put(np.asarray(batch["data"]), batch_sharding)
            ii = jax.device_put(np.asarray(batch["im_info"]),
                                batch_sharding)
        else:
            d = jnp.asarray(batch["data"])
            ii = jnp.asarray(batch["im_info"])
        out = fwd(params, d, ii)
        boxes = np.asarray(out["bbox_xyxy"])
        scores = np.asarray(out["cls_score"])
        classes = np.asarray(out["cls"])
        valid = np.asarray(out["det_valid"])
        masks = np.asarray(out["mask_prob"])
        for b in range(len(batch["im_id"])):
            if not batch["valid"][b]:
                continue
            scale = float(batch["im_info"][b][2])
            im_id = int(batch["im_id"][b])
            rec = roidb_by_id[im_id]
            keep = valid[b]
            img_boxes = boxes[b][keep] / scale
            img_masks = segm_results(img_boxes, masks[b][keep],
                                     rec["h"], rec["w"])
            for j, (bx, sc, cl, mk) in enumerate(zip(
                    img_boxes, scores[b][keep], classes[b][keep], img_masks)):
                x1, y1, x2, y2 = bx
                detections.append({
                    "image_id": im_id,
                    "category_id": int(cl),
                    "bbox": [float(x1), float(y1),
                             float(x2 - x1 + 1), float(y2 - y1 + 1)],
                    "score": float(sc),
                    "_mask": mk,
                })
            n_done += 1
    logger.info(f"inference done: {n_done} images in {time.time()-t0:.1f}s "
                f"({n_done / max(time.time()-t0, 1e-9):.2f} img/s)")

    detections = TestParam.process_output(detections, None)
    result_json = os.path.join(exp_dir, DatasetParam.image_set[0]
                               + "_segm_result.json")
    os.makedirs(exp_dir, exist_ok=True)
    # COCO segm result format: masks as compressed RLE (what the reference
    # emits through pycocotools encode, mask_test.py result json)
    from simpledet_tpu.data.rle import encode_rle
    with open(result_json, "w") as f:
        json.dump([dict({k: v for k, v in d.items() if k != "_mask"},
                        segmentation=encode_rle(d["_mask"]))
                   for d in detections], f)
    logger.info(f"wrote {result_json}")

    ann = TestParam.coco.annotation
    if not (ann and os.path.exists(ann)):
        logger.info("no annotation json; skipping COCO eval")
        return None

    with open(ann) as f:
        gt = json.load(f)
    # gt segmentations -> binary masks for the in-repo segm evaluator:
    # polygons via the native scanline fill, RLE (crowd gt) via the numpy
    # codec (simpledet_tpu/data/rle.py) — crowd instances must carry real
    # masks so the evaluator's crowd-ignore IoU matches pycocotools
    from simpledet_tpu.data.rle import segmentation_to_mask
    img_hw = {im["id"]: (im["height"], im["width"]) for im in gt["images"]}
    for a in gt.get("annotations", []):
        seg = a.get("segmentation")
        h, w = img_hw[a["image_id"]]
        a["_mask"] = segmentation_to_mask(seg, h, w)

    summaries = {}
    for iou_type in ("bbox", "segm"):
        evaluator = COCOEval(gt, iou_type=iou_type)
        cat_ids = evaluator.cat_ids
        dets = [dict(d) for d in detections]
        for d in dets:
            d["category_id"] = cat_ids[d["category_id"] - 1]
        logger.info(f"== {iou_type} ==")
        summaries[iou_type] = evaluator.evaluate(dets)
        logger.info(str(summaries[iou_type]))
    return summaries


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--max-images", type=int, default=None)
    args = ap.parse_args()
    mask_test_net(args.config, args.max_images)
