"""Component-level timings of the detection machinery at flagship shapes.
Prints one JSON line per component (ms per call, batch-2 equivalents)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np


def bench(fn, *args, n=10):
    import jax
    out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(jax.tree.leaves(out)[0])
    return (time.time() - t0) / n * 1000


def main():
    import jax
    import jax.numpy as jnp

    from simpledet_tpu.kernels.roi_align import multilevel_roi_align
    from simpledet_tpu.ops.anchors import generate_anchor_grid
    from simpledet_tpu.ops.nms import nms, nms_keep_sorted
    from simpledet_tpu.kernels.nms_pallas import nms_keep_sorted_pallas
    from simpledet_tpu.targets.anchor_target import batched_anchor_target
    from simpledet_tpu.targets.proposal import gen_proposals, top_proposals
    from simpledet_tpu.targets.proposal_target import batched_proposal_target

    rng = np.random.RandomState(0)
    h, w = 800, 1333
    strides = (4, 8, 16, 32, 64)
    grids = [generate_anchor_grid(-(-h // s), -(-w // s), s, (8,),
                                  (0.5, 1.0, 2.0)) for s in strides]
    anchors = jnp.asarray(np.concatenate(grids, 0))
    print(json.dumps({"n_anchors": int(anchors.shape[0])}), flush=True)

    gt = np.full((2, 100, 5), -1, np.float32)
    for i in range(20):
        x1, y1 = rng.uniform(0, 600, 2)
        gt[:, i] = [x1, y1, x1 + 100, y1 + 80, 1 + i % 80]
    gt = jnp.asarray(gt)
    im_hw = jnp.asarray([[800.0, 1333.0]] * 2)

    # 1) anchor target (rpn)
    at = jax.jit(lambda k, g, hw: batched_anchor_target(
        k, anchors, g, hw, allowed_border=0, neg_thr=0.3, pos_thr=0.7,
        min_pos_thr=0.0, image_anchor=256, fg_fraction=0.5))
    ms = bench(at, jax.random.PRNGKey(0), gt, im_hw)
    print(json.dumps({"component": "anchor_target_b2", "ms": round(ms, 2)}),
          flush=True)

    # 2) per-level proposal gen (decode + topk + NMS), all levels, batch 2
    scores = [jnp.asarray(rng.rand(2, g.shape[0]).astype(np.float32))
              for g in grids]
    deltas = [jnp.asarray(rng.randn(2, g.shape[0], 4).astype(np.float32) * .1)
              for g in grids]

    def proposals_all(scs, des, hw):
        def per_image(s_list, d_list, hw1):
            bx, sc = [], []
            for s_, d_, g in zip(s_list, d_list,
                                 [jnp.asarray(x) for x in grids]):
                b, s2 = gen_proposals(s_, d_, g, hw1,
                                      pre_nms_top_n=min(2000, s_.shape[0]),
                                      post_nms_top_n=min(2000, s_.shape[0]),
                                      nms_thr=0.7)
                bx.append(b)
                sc.append(s2)
            return top_proposals(bx, sc, 2000)
        return jax.vmap(per_image)(scs, des, hw)

    ms = bench(jax.jit(proposals_all), scores, deltas, im_hw)
    print(json.dumps({"component": "proposals_all_levels_b2",
                      "ms": round(ms, 2)}), flush=True)

    # 2b) a single 2000-box NMS, scan vs pallas
    boxes1 = jnp.asarray(rng.uniform(0, 800, (2000, 4)).astype(np.float32))
    boxes1 = boxes1.at[:, 2:].add(boxes1[:, :2])
    valid1 = jnp.ones(2000, bool)
    ms = bench(jax.jit(lambda b, v: nms_keep_sorted(b, v, 0.7)), boxes1,
               valid1)
    print(json.dumps({"component": "nms2000_scan", "ms": round(ms, 2)}),
          flush=True)
    ms = bench(jax.jit(lambda b, v: nms_keep_sorted_pallas(b, v, 0.7)),
               boxes1, valid1)
    print(json.dumps({"component": "nms2000_pallas", "ms": round(ms, 2)}),
          flush=True)

    # 3) proposal target
    props = jnp.asarray(rng.uniform(0, 700, (2, 2000, 4)).astype(np.float32))
    pt = jax.jit(lambda k, p, g: batched_proposal_target(
        k, p, g, image_rois=512, fg_fraction=0.25, fg_thr=0.5, bg_thr_hi=0.5,
        bg_thr_lo=0.0, num_reg_class=81, class_agnostic=False,
        bbox_mean=(0, 0, 0, 0), bbox_std=(0.1, 0.1, 0.2, 0.2),
        bbox_weight=(1, 1, 1, 1)))
    ms = bench(pt, jax.random.PRNGKey(0), props, gt)
    print(json.dumps({"component": "proposal_target_b2", "ms": round(ms, 2)}),
          flush=True)

    # 4) multilevel roi align fwd+bwd (512 rois, 256ch pyramid)
    feats = [jnp.asarray(rng.randn(-(-h // s), -(-w // s), 256)
                         .astype(np.float32)) for s in (4, 8, 16, 32)]
    rois = jnp.asarray(rng.uniform(0, 700, (512, 4)).astype(np.float32))
    rois = rois.at[:, 2:].add(rois[:, :2])

    def ra_fwdbwd(fs, r):
        def loss(fs_):
            out = multilevel_roi_align(fs_, r, (4, 8, 16, 32), out_size=7)
            return jnp.sum(out ** 2)
        return jax.grad(loss)(fs)

    ms = bench(jax.jit(ra_fwdbwd), feats, rois)
    print(json.dumps({"component": "roi_align512_fwdbwd_b1",
                      "ms": round(ms, 2)}), flush=True)

    ms = bench(jax.jit(lambda fs, r: multilevel_roi_align(
        fs, r, (4, 8, 16, 32), out_size=7)), feats, rois)
    print(json.dumps({"component": "roi_align512_fwd_b1",
                      "ms": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
