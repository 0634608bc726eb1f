"""Proposal recall eval CLI: python rpn_test.py --config config/<exp>.py

The TPU rewrite of the reference rpn_test.py: runs the rpn_test symbol
(proposals + scores), rescales to original image coords and reports proposal
recall against gt at IoU 0.5 / mean 0.5:0.95 for several proposal budgets.
"""
import argparse
import os

import numpy as np


def recall_at(gt, proposals, iou_thr):
    if len(gt) == 0:
        return None
    if len(proposals) == 0:
        return 0.0
    from simpledet_tpu.ops.bbox import bbox_overlaps
    import jax.numpy as jnp
    ov = np.asarray(bbox_overlaps(jnp.asarray(gt, jnp.float32),
                                  jnp.asarray(proposals, jnp.float32)))
    return float((ov.max(axis=1) >= iou_thr).mean())


def rpn_test_net(config_path, max_images=None):
    import jax
    from simpledet_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from simpledet_tpu.core.checkpoint import (get_latest_ckpt_epoch,
                                               load_checkpoint)
    from simpledet_tpu.core.config import load_config, patch_all
    from simpledet_tpu.data.loader import Loader
    from simpledet_tpu.data.roidb import load_roidb
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
    if max_images:
        roidb = roidb[:max_images]
    for i, r in enumerate(roidb):
        r["rec_id"] = i
    logger.info(f"proposal recall on {len(roidb)} images")

    model = ModelParam.rpn_test_symbol or ModelParam.test_symbol
    sample0 = next(iter(Loader([dict(roidb[0])], transform, 1, shuffle=False,
                               num_workers=0, keys=("data", "im_info"),
                               aspect_grouping=False)))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        jnp.asarray(sample0["data"]), jnp.asarray(sample0["im_info"]),
        mode="rpn_test")
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

    # pin checkpoint-restored host numpy on device once (see detection_test)
    params = jax.device_put(params)
    if batch_stats is not None:
        batch_stats = jax.device_put(batch_stats)

    def _vars(p):
        return {"params": p, "batch_stats": batch_stats} if batch_stats \
            else {"params": p}

    from simpledet_tpu.ops.image import device_normalize, find_pixel_norm
    _pn = find_pixel_norm(transform)
    def _fwd(p, d, ii):
        if _pn is not None:
            d = device_normalize(d, ii, *_pn)
        return model.apply(_vars(p), d, ii, mode="rpn_test")
    fwd = jax.jit(_fwd)
    loader = Loader(roidb, transform, 1, shuffle=False, num_workers=4,
                    keys=("data", "im_info", "im_id"), pad_last=False,
                    aspect_grouping=True)
    roidb_by_id = {r["im_id"]: r for r in roidb}

    budgets = (100, 300, 1000)
    thrs = np.arange(0.5, 1.0, 0.05)
    rec = {(n, t): [] for n in budgets for t in thrs}
    for batch in loader:
        out = fwd(params, jnp.asarray(batch["data"]),
                  jnp.asarray(batch["im_info"]))
        props = np.asarray(out["proposal"])
        scores = np.asarray(out["proposal_score"])
        for b in range(len(batch["im_id"])):
            if not batch["valid"][b]:
                continue
            scale = float(batch["im_info"][b][2])
            rec_gt = roidb_by_id[int(batch["im_id"][b])]
            gt = np.asarray(rec_gt.get("gt_bbox", []), np.float32)
            if gt.size == 0:
                continue
            valid = scores[b] > -1e9
            p = props[b][valid] / scale
            for n in budgets:
                for t in thrs:
                    r = recall_at(gt.reshape(-1, 4), p[:n], t)
                    if r is not None:
                        rec[(n, t)].append(r)

    for n in budgets:
        r50 = np.mean(rec[(n, 0.5)]) if rec[(n, 0.5)] else 0.0
        rmean = np.mean([np.mean(rec[(n, t)]) for t in thrs
                         if rec[(n, t)]])
        logger.info(f"Recall@{n}: IoU=0.5 {r50:.4f}  IoU=0.5:0.95 {rmean:.4f}")
    return {n: np.mean(rec[(n, 0.5)]) for n in budgets if rec[(n, 0.5)]}


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--max-images", type=int, default=None)
    args = ap.parse_args()
    rpn_test_net(args.config, args.max_images)
