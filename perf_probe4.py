"""Post-optimization component timings (see perf_probe2)."""
import json
import time

import numpy as np


def bench(fn, *args, n=10):
    import jax
    out = fn(*args)
    jax.device_get(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    jax.device_get(np.asarray(jax.tree.leaves(out)[0]).ravel()[0])
    return (time.time() - t0) / n * 1000


def main():
    import jax
    import jax.numpy as jnp

    from simpledet_tpu.core.config import load_config
    from simpledet_tpu.ops.anchors import generate_anchor_grid
    from simpledet_tpu.targets.anchor_target import batched_anchor_target
    from simpledet_tpu.kernels.roi_align import batched_multilevel_roi_align

    rng = np.random.RandomState(0)
    h, w = 800, 1333
    strides = (4, 8, 16, 32, 64)
    grids = [generate_anchor_grid(-(-h // s), -(-w // s), s, (8,),
                                  (0.5, 1.0, 2.0)) for s in strides]
    anchors = jnp.asarray(np.concatenate(grids, 0))
    gt = np.full((2, 100, 5), -1, np.float32)
    for i in range(20):
        x1, y1 = rng.uniform(0, 600, 2)
        gt[:, i] = [x1, y1, x1 + 100, y1 + 80, 1 + i % 80]
    gt = jnp.asarray(gt)
    im_hw = jnp.asarray([[800.0, 1333.0]] * 2)

    at = jax.jit(lambda k, g, hw: batched_anchor_target(
        k, anchors, g, hw, allowed_border=0, neg_thr=0.3, pos_thr=0.7,
        min_pos_thr=0.0, image_anchor=256, fg_fraction=0.5))
    print(json.dumps({"component": "anchor_target_b2",
                      "ms": round(bench(at, jax.random.PRNGKey(0), gt,
                                        im_hw), 2)}), flush=True)

    # full rpn proposals path at flagship shapes via the model helper
    cfg = load_config("config/faster_r50v1_fpn_1x.py")
    out13 = cfg.get_config(is_train=True)
    RpnParam = out13[2]
    from simpledet_tpu.models.rpn import FPNRpnHead, feature_shape
    from simpledet_tpu.core.config import patch_config_as_nothrow
    head = FPNRpnHead(patch_config_as_nothrow(RpnParam))
    level_outputs = {}
    for s in (4, 8, 16, 32, 64):
        fh, fw = feature_shape((h, w), s)
        level_outputs[f"stride{s}"] = (
            jnp.asarray(rng.randn(2, fh, fw, 6).astype(np.float32)),
            jnp.asarray(rng.randn(2, fh, fw, 12).astype(np.float32) * .1))
    im_info = jnp.asarray([[800., 1333., 1.]] * 2)
    prop = jax.jit(lambda lo: head.proposals(lo, im_info, (h, w),
                                             is_train=True))
    print(json.dumps({"component": "rpn_proposals_b2",
                      "ms": round(bench(prop, level_outputs), 2)}),
          flush=True)

    # gather roi-align fwd+bwd batch 2 x 512
    feats = [jnp.asarray(rng.randn(2, -(-h // s), -(-w // s), 256)
                         .astype(np.float32)) for s in (4, 8, 16, 32)]
    xy = rng.uniform(0, 700, (2, 512, 2)).astype(np.float32)
    wh = rng.uniform(20, 400, (2, 512, 2)).astype(np.float32)
    rois = jnp.asarray(np.concatenate([xy, xy + wh], -1))

    def ra_fwdbwd(fs, r):
        return jax.grad(lambda f2: jnp.sum(batched_multilevel_roi_align(
            f2, r, (4, 8, 16, 32), out_size=7) ** 2))(fs)
    print(json.dumps({"component": "roi_align_gather_b2x512_fwdbwd",
                      "ms": round(bench(jax.jit(ra_fwdbwd), feats, rois,
                                        n=5), 2)}), flush=True)


if __name__ == "__main__":
    main()
