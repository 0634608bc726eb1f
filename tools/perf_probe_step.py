"""Perf ablation on the real chip: time the train step in pieces to find
the bottleneck. Prints one JSON line per ablation. Not part of the bench
contract (bench.py stays the single-line driver hook)."""
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import json
import time

import numpy as np


def timeit(fn, state, batch, key, n=8):
    import jax
    for i in range(2):
        state, losses, _ = fn(state, batch, jax.random.fold_in(key, i))
    jax.device_get(losses)
    t0 = time.time()
    for i in range(n):
        state, losses, _ = fn(state, batch, jax.random.fold_in(key, 99 + i))
    jax.device_get(losses)
    return n / (time.time() - t0)


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

    for cfg_path, tag in (("config/faster_r50v1_fpn_1x.py", "fp32"),
                          ("config/faster_r50v1_fpn_bf16_1x.py", "bf16")):
        cfg = load_config(cfg_path)
        out = cfg.get_config(is_train=True)
        General, ModelParam, OptimizeParam = out[0], out[6], out[7]
        model = ModelParam.train_symbol

        b, h, w = 2, 800, 1333
        rng = np.random.RandomState(0)
        gt = np.full((b, 100, 5), -1, np.float32)
        for i in range(20):
            x1, y1 = rng.uniform(0, 600, 2)
            gt[:, i] = [x1, y1, x1 + rng.uniform(30, 300),
                        y1 + rng.uniform(30, 200), rng.randint(1, 81)]
        batch = {
            "data": jnp.asarray(rng.randn(b, h, w, 3), jnp.float32),
            "im_info": jnp.asarray(np.tile([[h, w, 1.0]], (b, 1)),
                                   jnp.float32),
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
        step = make_train_step(model, mesh=None, donate=False)
        ips = timeit(step, state, batch, jax.random.PRNGKey(7)) * b
        print(json.dumps({"ablation": f"full_step_{tag}",
                          "img_per_sec": round(ips, 2)}), flush=True)

        # backbone+neck only: fwd+bwd on the pyramid sum
        pyr_model = model

        def bb_step(state, batch_, key):
            def loss_fn(p):
                feats = pyr_model.backbone.apply(
                    {"params": p["backbone"]}, batch_["data"])
                pyr = pyr_model.neck.apply({"params": p["neck"]}, feats)
                total = sum(jnp.sum(jnp.square(v.astype(jnp.float32)))
                            for v in pyr.values()) * 1e-8
                return total, ({"l": total}, {})
            grads, (losses, aux) = jax.grad(loss_fn, has_aux=True)(
                state.params)
            return state, losses, aux

        ips = timeit(jax.jit(bb_step), state, batch,
                     jax.random.PRNGKey(7)) * b
        print(json.dumps({"ablation": f"backbone_neck_fwdbwd_{tag}",
                          "img_per_sec": round(ips, 2)}), flush=True)


if __name__ == "__main__":
    main()
