"""bf16-vs-fp32 flagship throughput probe on the real chip; optional
jax.profiler trace of the winner (--profile <dir>). One JSON line each."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import sys
import time

import numpy as np


def bench_config(path, batch_image=2, h=800, w=1333, n_iter=10, profile=None):
    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/simpledet_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from simpledet_tpu.core.config import load_config
    from simpledet_tpu.core.optimizer import freeze_mask, make_optimizer
    from simpledet_tpu.core.schedule import warmup_multifactor
    from simpledet_tpu.core.train import TrainState, make_train_step

    cfg = load_config(path)
    (General, KvstoreParam, RpnParam, RoiParam, BboxParam, DatasetParam,
     ModelParam, OptimizeParam, TestParam, transform, data_name, label_name,
     metric_list) = cfg.get_config(is_train=True)
    model = ModelParam.train_symbol

    rng = np.random.RandomState(0)
    gt = np.full((batch_image, 100, 5), -1, np.float32)
    for b in range(batch_image):
        for i in range(20):
            x1, y1 = rng.uniform(0, 600, 2)
            gt[b, i] = [x1, y1, x1 + rng.uniform(30, 300),
                        y1 + rng.uniform(30, 200), rng.randint(1, 81)]
    batch = {
        "data": jnp.asarray(rng.randn(batch_image, h, w, 3), jnp.float32),
        "im_info": jnp.asarray(
            np.tile(np.array([[h, w, 1.0]], np.float32), (batch_image, 1))),
        "gt_bbox": jnp.asarray(gt),
    }
    variables = jax.jit(
        lambda k1, k2, d, ii, g: model.init(
            {"params": k1, "sampling": k2}, d, ii, g, mode="train"))(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1),
        batch["data"][:1], batch["im_info"][:1], batch["gt_bbox"][:1])
    params = variables["params"]
    sched = warmup_multifactor(0.02, [60000], warmup_lr=0.007,
                               warmup_iter=500)
    mask = freeze_mask(params, ModelParam.pretrain.fixed_param)
    tx = make_optimizer(sched, momentum=0.9, wd=1e-4, trainable_mask=mask)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step = make_train_step(model, mesh=None, donate=False)
    key = jax.random.PRNGKey(7)

    for i in range(3):
        state, losses, _ = step(state, batch, jax.random.fold_in(key, i))
    jax.device_get(losses)

    if profile:
        jax.profiler.start_trace(profile)
    t0 = time.time()
    for i in range(n_iter):
        state, losses, _ = step(state, batch,
                                jax.random.fold_in(key, 100 + i))
    jax.device_get(losses)
    dt = time.time() - t0
    if profile:
        jax.profiler.stop_trace()
    img_s = batch_image * n_iter / dt
    print(json.dumps({"config": path, "batch": batch_image,
                      "img_per_sec": round(img_s, 3),
                      "ms_per_iter": round(1000 * dt / n_iter, 1)}),
          flush=True)
    return img_s


if __name__ == "__main__":
    profile = None
    if "--profile" in sys.argv:
        profile = sys.argv[sys.argv.index("--profile") + 1]
    configs = [a for a in sys.argv[1:] if a.endswith(".py")]
    batches = [int(a.split("=")[1]) for a in sys.argv if a.startswith("b=")]
    for c in configs or ["config/faster_r50v1_fpn_bf16_1x.py"]:
        for b in (batches or [2]):
            bench_config(c, batch_image=b, profile=profile)
