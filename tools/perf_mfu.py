"""MFU estimate for the flagship train step.

Compiles the train step and reads XLA's cost analysis (analytical flops of
the optimized HLO), then divides by measured step time x chip peak to get
model-flops-utilization. Peak flops are looked up by device kind; override
with --peak <TFLOPs>. Pass --img-per-sec to reuse a throughput measured by
tools/perf_probe_step.py / bench.py instead of re-timing here.

Usage:
    python tools/perf_mfu.py [config] [--batch N] [--img-per-sec X]
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np

# bf16 matmul peak per chip, from public TPU spec sheets
PEAK_TFLOPS = {
    "TPU v2": 45.0,
    "TPU v3": 123.0 / 2,      # per chip = 2 cores x 61.5? v3 chip = 123 board/2
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
}


def main():
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/simpledet_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from simpledet_tpu.core.config import load_config
    from simpledet_tpu.core.optimizer import freeze_mask, make_optimizer
    from simpledet_tpu.core.train import TrainState, make_train_step

    argv = sys.argv[1:]
    cfg_path = next((a for a in argv if a.endswith(".py")),
                    "config/faster_r50v1_fpn_bf16_1x.py")
    batch_image = int(argv[argv.index("--batch") + 1]) \
        if "--batch" in argv else 2
    img_per_sec = float(argv[argv.index("--img-per-sec") + 1]) \
        if "--img-per-sec" in argv else None
    peak_override = float(argv[argv.index("--peak") + 1]) \
        if "--peak" in argv else None

    cfg = load_config(cfg_path)
    out = cfg.get_config(is_train=True)
    ModelParam = out[6]
    model = ModelParam.train_symbol

    b, h, w = batch_image, 800, 1333
    rng = np.random.RandomState(0)
    gt = np.full((b, 100, 5), -1, np.float32)
    for i in range(20):
        x1, y1 = rng.uniform(0, 600, 2)
        gt[:, i] = [x1, y1, x1 + rng.uniform(30, 300),
                    y1 + rng.uniform(30, 200), rng.randint(1, 81)]
    batch = {
        "data": jnp.asarray(rng.randn(b, h, w, 3), jnp.float32),
        "im_info": jnp.asarray(np.tile([[h, w, 1.0]], (b, 1)), jnp.float32),
        "gt_bbox": jnp.asarray(gt),
    }
    variables = jax.jit(
        lambda k1, k2, d, ii, g: model.init(
            {"params": k1, "sampling": k2}, d, ii, g, mode="train"))(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1),
        batch["data"][:1], batch["im_info"][:1], batch["gt_bbox"][:1])
    tx = make_optimizer(lambda s: 0.01, momentum=0.9, wd=1e-4,
                        trainable_mask=freeze_mask(
                            variables["params"],
                            ["conv0", "stage1", "scale", "bias"]))
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx)
    step_fn = make_train_step(model, mesh=None, donate=False)

    key = jax.random.PRNGKey(7)
    lowered = jax.jit(step_fn).lower(state, batch, key)
    compiled = lowered.compile()
    cost = compiled.cost_analysis()
    if isinstance(cost, list):  # older jax returns one dict per device
        cost = cost[0]
    flops = float(cost.get("flops", 0.0))
    bytes_acc = float(cost.get("bytes accessed", 0.0))

    if img_per_sec is None:
        for i in range(3):
            state, losses, _ = step_fn(state, batch, jax.random.fold_in(key, i))
        jax.device_get(losses)
        n = 10
        t0 = time.time()
        for i in range(n):
            state, losses, _ = step_fn(state, batch,
                                       jax.random.fold_in(key, 99 + i))
        jax.device_get(losses)
        img_per_sec = b * n / (time.time() - t0)

    step_s = b / img_per_sec
    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", str(dev))
    peak = peak_override or next(
        (v for k, v in PEAK_TFLOPS.items() if k.lower() in kind.lower()), None)
    achieved_tflops = flops / step_s / 1e12
    print(json.dumps({
        "config": cfg_path, "batch": b, "device": kind,
        "hlo_gflops_per_step": round(flops / 1e9, 1),
        "hlo_gb_accessed_per_step": round(bytes_acc / 1e9, 2),
        "img_per_sec": round(img_per_sec, 2),
        "achieved_tflops": round(achieved_tflops, 2),
        "peak_tflops": peak,
        "mfu_pct": round(100 * achieved_tflops / peak, 1) if peak else None,
        "arith_intensity_flops_per_byte":
            round(flops / bytes_acc, 1) if bytes_acc else None,
    }))


if __name__ == "__main__":
    main()
