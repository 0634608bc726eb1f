"""Device-time profile of the TEST graph (detection_infer_speed workload):
jax.profiler trace of jitted test forwards, aggregated per HLO op.

Wall-clock ms/img over the axon tunnel is noisy (host contention +
dispatch); this prints DEVICE time, which is what optimization must move.

python tools/perf_trace_infer.py [config] [--batch N] [--steps N] [--top N]
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from tools.perf_trace import TRACE_DIR, parse_trace


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config", nargs="?",
                    default="config/faster_r50v1_fpn_bf16_1x.py")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--shape", nargs=2, type=int, default=[800, 1333])
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from simpledet_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()
    from simpledet_tpu.core.config import load_config

    cfg = load_config(args.config)
    ModelParam = cfg.get_config(is_train=False)[6]
    model = ModelParam.test_symbol

    h, w = args.shape
    b = args.batch
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(b, h, w, 3), jnp.float32)
    im_info = jnp.asarray(np.tile([[h, w, 1.0]], (b, 1)), jnp.float32)
    params = jax.jit(lambda k1, k2, d, i: model.init(
        {"params": k1, "sampling": k2}, d, i, mode="test"))(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1), data, im_info)["params"]
    fwd = jax.jit(lambda p, d, i: model.apply({"params": p}, d, i,
                                              mode="test"))

    out = fwd(params, data, im_info)
    jax.device_get(out["roi_score"])

    os.makedirs(TRACE_DIR, exist_ok=True)
    jax.profiler.start_trace(TRACE_DIR)
    acc = 0.0
    for _ in range(args.steps):
        out = fwd(params, data, im_info)
        acc = acc + out["roi_score"].sum()
    float(acc)
    jax.profiler.stop_trace()
    parse_trace(args.top, args.steps)


if __name__ == "__main__":
    main()
