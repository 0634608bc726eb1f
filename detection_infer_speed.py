"""Inference-speed CLI (reference detection_infer_speed.py:1-78):
builds the test graph, times jitted forwards on dummy data, prints ms/image.

python detection_infer_speed.py --config config/X.py --shape 800 1333 --count 100
"""
import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--shape", nargs=2, type=int, default=[800, 1333])
    ap.add_argument("--count", type=int, default=50)
    ap.add_argument("--batch", type=int, default=1)
    args = ap.parse_args()

    import jax
    from simpledet_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()
    import jax.numpy as jnp

    from simpledet_tpu.core.config import load_config

    cfg = load_config(args.config)
    (General, KvstoreParam, RpnParam, RoiParam, BboxParam, DatasetParam,
     ModelParam, OptimizeParam, TestParam, transform, data_name, label_name,
     metric_list) = cfg.get_config(is_train=False)
    model = ModelParam.test_symbol

    h, w = args.shape
    b = args.batch
    data = jnp.asarray(np.random.randn(b, h, w, 3), jnp.float32)
    im_info = jnp.asarray(np.tile([[h, w, 1.0]], (b, 1)), jnp.float32)

    params = model.init({"params": jax.random.PRNGKey(0),
                         "sampling": jax.random.PRNGKey(1)},
                        data, im_info, mode="test")["params"]
    fwd = jax.jit(lambda p, d, i: model.apply({"params": p}, d, i,
                                              mode="test"))

    out = fwd(params, data, im_info)
    jax.device_get(out["roi_score"])

    # chain iterations through a scalar so pipelining is kept but no
    # iteration can be skipped (axon block_until_ready is unreliable)
    acc = 0.0
    t0 = time.time()
    for _ in range(args.count):
        out = fwd(params, data, im_info)
        acc = acc + out["roi_score"].sum()
    float(acc)
    dt = time.time() - t0
    n_img = args.count * b
    print(f"{dt / n_img * 1000:.2f} ms per image "
          f"({n_img / dt:.2f} img/s) at {h}x{w}, batch {b}")


if __name__ == "__main__":
    main()
