"""Peak-HBM analysis of the flagship train step at a given batch size.

Compiles the step (no execution) and prints XLA's memory analysis —
the triage tool for "does batch N fit?" without risking a device crash:
if peak HBM exceeds the chip's capacity the batch sweep should use remat
or stop, and a run-time failure at a batch whose compiled peak FITS points
at a kernel fault instead of OOM.

Usage:
    python tools/perf_memory.py [config] [--batch N] [--remat]
"""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from simpledet_tpu.core.config import load_config
    from simpledet_tpu.core.optimizer import freeze_mask, make_optimizer
    from simpledet_tpu.core.train import TrainState, make_train_step
    from simpledet_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    argv = sys.argv[1:]
    cfg_path = next((a for a in argv if a.endswith(".py")),
                    "config/faster_r50v1_fpn_bf16_1x.py")
    b = int(argv[argv.index("--batch") + 1]) if "--batch" in argv else 4

    cfg = load_config(cfg_path)
    out = cfg.get_config(is_train=True)
    ModelParam = out[6]
    if "--remat" in argv:
        ModelParam.memonger = True
    model = ModelParam.train_symbol

    h, w = 800, 1333
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

    compiled = jax.jit(step_fn).lower(
        state, batch, jax.random.PRNGKey(7)).compile()
    mem = compiled.memory_analysis()
    row = {"config": cfg_path, "batch": b,
           "remat": bool(getattr(ModelParam, "memonger", False))}
    if mem is None:
        row["error"] = "memory_analysis unavailable on this backend"
    else:
        for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "alias_size_in_bytes",
                  "generated_code_size_in_bytes"):
            v = getattr(mem, k, None)
            if v is not None:
                row[k.replace("_in_bytes", "_gb")] = round(v / 2**30, 3)
        tot = (getattr(mem, "temp_size_in_bytes", 0)
               + getattr(mem, "argument_size_in_bytes", 0)
               + getattr(mem, "output_size_in_bytes", 0)
               - getattr(mem, "alias_size_in_bytes", 0))
        row["peak_hbm_gb_approx"] = round(tot / 2**30, 3)
    print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
