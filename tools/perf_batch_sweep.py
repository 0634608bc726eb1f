"""Throughput vs per-chip batch size for the flagship train step (fp32 and
bf16). Larger batches amortize the fixed detection machinery (NMS, top-k,
target assignment) over more images — the key single-chip lever once the
step is memory-light. One JSON line per point."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np


def run(cfg_path, batch, hw=(800, 1333)):
    import jax
    import jax.numpy as jnp

    from simpledet_tpu.core.config import load_config
    from simpledet_tpu.core.optimizer import freeze_mask, make_optimizer
    from simpledet_tpu.core.train import TrainState, make_train_step
    from simpledet_tpu.utils.jax_cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = load_config(cfg_path)
    out = cfg.get_config(is_train=True)
    model = out[6].train_symbol
    h, w = hw
    rng = np.random.RandomState(0)
    gt = np.full((batch, 100, 5), -1, np.float32)
    for bb in range(batch):
        for i in range(20):
            x1, y1 = rng.uniform(0, 600, 2)
            gt[bb, i] = [x1, y1, x1 + rng.uniform(30, 300),
                         y1 + rng.uniform(30, 200), rng.randint(1, 81)]
    b = {"data": jnp.asarray(rng.randn(batch, h, w, 3), jnp.float32),
         "im_info": jnp.asarray(np.tile([[h, w, 1.0]], (batch, 1)),
                                jnp.float32),
         "gt_bbox": jnp.asarray(gt)}
    variables = jax.jit(
        lambda k1, k2, d, ii, g: model.init(
            {"params": k1, "sampling": k2}, d, ii, g, mode="train"))(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1),
        b["data"][:1], b["im_info"][:1], b["gt_bbox"][:1])
    tx = make_optimizer(lambda s: 0.01, momentum=0.9, wd=1e-4,
                        trainable_mask=freeze_mask(
                            variables["params"],
                            ["conv0", "stage1", "scale", "bias"]))
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx)
    step = make_train_step(model, mesh=None, donate=False)
    key = jax.random.PRNGKey(7)
    for i in range(2):
        state, losses, _ = step(state, b, jax.random.fold_in(key, i))
    jax.device_get(losses)
    n = 8
    t0 = time.time()
    for i in range(n):
        state, losses, _ = step(state, b, jax.random.fold_in(key, 99 + i))
    jax.device_get(losses)
    dt = time.time() - t0
    print(json.dumps({"config": cfg_path, "batch": batch, "h": h, "w": w,
                      "img_per_sec": round(batch * n / dt, 2),
                      "ms_per_iter": round(1000 * dt / n, 1)}), flush=True)


if __name__ == "__main__":
    cfgs = [a for a in sys.argv[1:] if a.endswith(".py")] or \
        ["config/faster_r50v1_fpn_bf16_1x.py"]
    batches = [int(a.split("=")[1]) for a in sys.argv
               if a.startswith("b=")] or [4, 8]
    hw = next((tuple(int(v) for v in a.split("=")[1].split(","))
               for a in sys.argv if a.startswith("hw=")), (800, 1333))
    for c in cfgs:
        for bt in batches:
            run(c, bt, hw)
