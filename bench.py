"""Benchmark: Faster R-CNN R50-FPN 1x train throughput on one TPU chip.

Prints ONE JSON line. Benches the bf16 flagship (mixed precision is the
reference's headline feature and the best-practice TPU training dtype) at
its best per-chip batch (8 — the round-4 sweep in doc/BENCHMARK.md:
31.3/34.6/52.9/56.2 img/s at batch 2/4/8/16 after the RoIAlign kernel
work; peak HBM 5.1 GB at 8, and batch 16's +6% does not justify 2x
activation memory). The comparable
reference number is its best fp16 row: 77 img/s on 8x 2080Ti at
4 img/GPU = 9.625 img/s per GPU (reference MODEL_ZOO.md:129, copied in
BASELINE.md; at 2 img/GPU it is 8.125, and fp32 is 5.375). Same
workload: 800x1333 padded inputs, full train step (fwd+bwd+SGD+in-graph
target generation) on one chip. The batch-2 rate (31.3 img/s = 3.85x the
reference's 2-img/GPU fp16 row) is tracked in doc/BENCHMARK.md.
"""
import json
import time

import numpy as np

BASELINE_IMG_PER_SEC_PER_GPU = 77.0 / 8.0  # reference best fp16 row (4 img/GPU)


def main():
    import jax
    import jax.numpy as jnp

    # persistent XLA compilation cache: the full train step cold-compiles in
    # ~9 min over the TPU tunnel; warm runs reuse the serialized executable
    import os
    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               "/tmp/simpledet_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from simpledet_tpu.core.config import load_config
    from simpledet_tpu.core.optimizer import freeze_mask, make_optimizer
    from simpledet_tpu.core.schedule import warmup_multifactor
    from simpledet_tpu.core.train import TrainState, make_train_step

    cfg = load_config("config/faster_r50v1_fpn_bf16_1x.py")
    (General, KvstoreParam, RpnParam, RoiParam, BboxParam, DatasetParam,
     ModelParam, OptimizeParam, TestParam, transform, data_name, label_name,
     metric_list) = cfg.get_config(is_train=True)
    model = ModelParam.train_symbol

    batch_image = 8
    h, w = 800, 1333
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

    # jit the init: unjitted tracing dispatches hundreds of ops one-by-one
    # over the TPU tunnel (minutes); jitted it is one compile (~20 s)
    variables = jax.jit(
        lambda k1, k2, d, ii, g: model.init(
            {"params": k1, "sampling": k2}, d, ii, g, mode="train"))(
        jax.random.PRNGKey(0), jax.random.PRNGKey(1),
        batch["data"][:1], batch["im_info"][:1], batch["gt_bbox"][:1])
    params = variables["params"]

    sched = warmup_multifactor(OptimizeParam.optimizer.lr,
                               OptimizeParam.schedule.lr_iter,
                               warmup_lr=OptimizeParam.warmup.lr,
                               warmup_iter=OptimizeParam.warmup.iter)
    mask = freeze_mask(params, ModelParam.pretrain.fixed_param)
    tx = make_optimizer(sched, momentum=OptimizeParam.optimizer.momentum,
                        wd=OptimizeParam.optimizer.wd, trainable_mask=mask)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)

    step = make_train_step(model, mesh=None, donate=False)
    key = jax.random.PRNGKey(7)

    # NOTE: device_get, not block_until_ready — the axon tunnel's
    # block_until_ready can return before execution finishes; a host
    # transfer cannot. Iterations chain through `state`, so fetching the
    # last losses forces the whole timed sequence while still allowing
    # step-level pipelining.
    # warmup (compile + 2 steps)
    for i in range(3):
        state, losses, _ = step(state, batch, jax.random.fold_in(key, i))
    jax.device_get(losses)

    n_iter = 10
    t0 = time.time()
    for i in range(n_iter):
        state, losses, _ = step(state, batch, jax.random.fold_in(key, 100 + i))
    jax.device_get(losses)
    dt = time.time() - t0

    img_per_sec = batch_image * n_iter / dt
    print(json.dumps({
        "metric": "faster_r50v1_fpn bf16 train throughput (1 chip, batch 8, 800x1333)",
        "value": round(img_per_sec, 3),
        "unit": "img/s/chip",
        "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC_PER_GPU, 3),
    }))


def main_with_retry(attempts=3):
    """The axon tunnel occasionally drops a run with a transient
    'TPU worker process crashed or restarted' / remote_compile error
    (observed twice during the round-4 batch sweep, both spurious —
    identical workloads passed on retry). The driver runs this script
    once per round, so retry in-process rather than record a fluke."""
    for i in range(attempts):
        try:
            return main()
        except Exception as e:  # noqa: BLE001
            msg = str(e)
            transient = any(t in msg for t in (
                "UNAVAILABLE", "remote_compile", "crashed or restarted",
                "INTERNAL"))
            if not transient or i == attempts - 1:
                raise
            import sys
            print(f"transient device error, retrying ({i + 1}/"
                  f"{attempts - 1}): {msg.splitlines()[0][:120]}",
                  file=sys.stderr)
            time.sleep(20)


if __name__ == "__main__":
    main_with_retry()
