"""Ablation timings of the TEST graph (detection_infer_speed workload).

Times cumulative prefixes of the test path — backbone+neck, +rpn convs,
+proposal gen, +roi align, +bbox head (= full test graph) — so the ms/img
gap between stages is each component's cost inside the fused graph.

python tools/perf_probe_infer.py --config config/faster_r50v1_fpn_bf16_1x.py
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="config/faster_r50v1_fpn_bf16_1x.py")
    ap.add_argument("--shape", nargs=2, type=int, default=[800, 1333])
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--count", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from simpledet_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()
    from simpledet_tpu.core.config import load_config

    cfg = load_config(args.config)
    (General, KvstoreParam, RpnParam, RoiParam, BboxParam, DatasetParam,
     ModelParam, OptimizeParam, TestParam, transform, data_name, label_name,
     metric_list) = cfg.get_config(is_train=False)
    model = ModelParam.test_symbol

    h, w = args.shape
    b = args.batch
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(b, h, w, 3), jnp.float32)
    im_info = jnp.asarray(np.tile([[h, w, 1.0]], (b, 1)), jnp.float32)

    variables = jax.jit(lambda k1, k2, d, i: model.init(
        {"params": k1, "sampling": k2}, d, i, mode="test"))(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1), data, im_info)
    params = variables["params"]

    def stage_pyr(p, d, i):
        return model.apply({"params": p}, d, method=model.pyramid)

    def stage_rpn(p, d, i):
        pyr = model.apply({"params": p}, d, method=model.pyramid)
        return model.apply({"params": p}, pyr,
                           method=lambda m, x: m.rpn_module(x))

    def stage_prop(p, d, i):
        pyr = model.apply({"params": p}, d, method=model.pyramid)
        rpn_out = model.apply({"params": p}, pyr,
                              method=lambda m, x: m.rpn_module(x))
        return model.rpn.proposals(rpn_out, i, d.shape[1:3], is_train=False)

    def stage_roi(p, d, i):
        pyr = model.apply({"params": p}, d, method=model.pyramid)
        rpn_out = model.apply({"params": p}, pyr,
                              method=lambda m, x: m.rpn_module(x))
        props, _ = model.rpn.proposals(rpn_out, i, d.shape[1:3],
                                       is_train=False)
        return model.apply({"params": p}, pyr, props,
                           method=lambda m, f, r: m.extract_rois(f, r))

    def stage_full(p, d, i):
        return model.apply({"params": p}, d, i, mode="test")

    stages = [("backbone+neck", stage_pyr), ("+rpn_convs", stage_rpn),
              ("+proposals", stage_prop), ("+roi_align", stage_roi),
              ("full_test_graph", stage_full)]

    prev = 0.0
    for name, fn in stages:
        jfn = jax.jit(fn)
        out = jfn(params, data, im_info)
        jax.device_get(jax.tree.leaves(out)[0])
        # chain through a scalar so no iteration is skipped
        acc = 0.0
        t0 = time.time()
        for _ in range(args.count):
            out = jfn(params, data, im_info)
            acc = acc + jax.tree.leaves(out)[0].astype(jnp.float32).sum()
        float(acc)
        ms = (time.time() - t0) / args.count / b * 1000
        print(json.dumps({"stage": name, "ms_per_img": round(ms, 2),
                          "delta_ms": round(ms - prev, 2)}), flush=True)
        prev = ms


if __name__ == "__main__":
    main()
