"""Instrument the retina-under-SGD stall (VERDICT r4 Weak #5).

Builds config/converge_retina.py, takes real batches from the converge
dataset, and prints per-parameter-group gradient statistics:
RMS(grad), RMS(weight), and the relative update size lr*RMS(g)/RMS(w) an
SGD step would apply — the number that explains whether a group can move.
Optionally runs N probe steps and reports loss trajectory.

  python tools/probe_retina_sgd.py --lr 0.005 --steps 40 [--opt sgd]

Compare against the reference's SGD recipe semantics
(/root/reference/models/retinanet/builder.py:254-333 focal 'valid'
normalization; :46-48 bias init; config/retina_r50v1_fpn_1x.py lr 0.01
batch 16 with an ImageNet-PRETRAINED backbone).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def group_of(path):
    name = "/".join(str(p) for p in path)
    if "backbone" in name:
        return "backbone"
    if "neck" in name or "lateral" in name or "P" == name[0]:
        return "neck"
    if "cls_pred" in name:
        return "cls_pred"
    if "bbox_pred" in name:
        return "bbox_pred"
    if "cls_conv" in name:
        return "cls_tower"
    if "bbox_conv" in name:
        return "bbox_tower"
    return "other"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--lr", type=float, default=0.005)
    ap.add_argument("--opt", default="sgd")
    ap.add_argument("--steps", type=int, default=0)
    ap.add_argument("--batch", type=int, default=8)
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    os.environ.setdefault("CONVERGE_RETINA_OPT", args.opt)
    os.environ.setdefault("CONVERGE_RETINA_LR", str(args.lr))
    os.environ.setdefault("CONVERGE_RETINA_BATCH",
                          str(args.batch if not args.cpu else 1))

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        from jax._src import xla_bridge as _xb
        _xb._backend_factories.pop("axon", None)
    import flax
    import jax.numpy as jnp
    import numpy as np

    from simpledet_tpu.utils.jax_cache import enable_compilation_cache
    enable_compilation_cache()

    root = os.environ.setdefault("CONVERGE_DATA_ROOT",
                                 "/tmp/simpledet_converge")
    if not os.path.exists(os.path.join(root, "annotations.json")):
        from tests.fixtures import make_micro_dataset
        make_micro_dataset(root, n_images=16, set_names=("converge_train",))

    from simpledet_tpu.core.config import load_config
    from simpledet_tpu.core.optimizer import make_optimizer
    from simpledet_tpu.core.train import TrainState, make_train_step
    from simpledet_tpu.data.loader import Loader
    from simpledet_tpu.data.roidb import append_flipped, load_roidb
    from simpledet_tpu.ops.image import device_normalize, find_pixel_norm

    cfg = load_config("config/converge_retina.py")
    (General, _K, RpnParam, _Roi, _Bbox, DatasetParam, ModelParam,
     OptimizeParam, _T, transform, _d, _l, _m) = cfg.get_config(is_train=True)
    model = ModelParam.train_symbol

    roidb = append_flipped(load_roidb(DatasetParam.image_set,
                                      DatasetParam.cache_dir))
    global_batch = General.batch_image * jax.device_count()
    loader = Loader(roidb, transform, global_batch, shuffle=True,
                    num_workers=2)
    batch = next(iter(loader))
    batch.pop("valid", None)
    pixel_norm = find_pixel_norm(transform)
    data = jnp.asarray(batch["data"])
    if pixel_norm is not None:
        data = device_normalize(data, jnp.asarray(batch["im_info"]),
                                *pixel_norm)

    rng = jax.random.PRNGKey(0)
    variables = jax.jit(lambda k1, k2: model.init(
        {"params": k1, "sampling": k2}, data, jnp.asarray(batch["im_info"]),
        jnp.asarray(batch["gt_bbox"]), mode="train"))(
        rng, jax.random.fold_in(rng, 1))
    params = variables["params"]
    bs = variables.get("batch_stats") or None

    def loss_fn(p, key):
        kw = {"params": p}
        if bs is not None:
            kw["batch_stats"] = bs
            (losses, aux), _ = model.apply(
                kw, data, jnp.asarray(batch["im_info"]),
                jnp.asarray(batch["gt_bbox"]), mode="train",
                rngs={"sampling": key}, mutable=["batch_stats"])
        else:
            losses, aux = model.apply(
                kw, data, jnp.asarray(batch["im_info"]),
                jnp.asarray(batch["gt_bbox"]), mode="train",
                rngs={"sampling": key})
        return sum(jnp.asarray(v, jnp.float32)
                   for v in losses.values()), losses

    grad_fn = jax.jit(jax.grad(loss_fn, has_aux=True))
    grads, losses = grad_fn(params, jax.random.PRNGKey(7))

    flat_g = flax.traverse_util.flatten_dict(jax.tree.map(np.asarray, grads))
    flat_w = flax.traverse_util.flatten_dict(jax.tree.map(np.asarray, params))
    agg = {}
    for path, g in flat_g.items():
        grp = group_of(path)
        w = flat_w[path]
        a = agg.setdefault(grp, {"g2": 0.0, "w2": 0.0, "n": 0})
        a["g2"] += float((g.astype(np.float64) ** 2).sum())
        a["w2"] += float((w.astype(np.float64) ** 2).sum())
        a["n"] += g.size
    print(f"losses at init: "
          f"{ {k: round(float(v), 4) for k, v in losses.items()} }")
    print(f"{'group':12s} {'RMS(g)':>12s} {'RMS(w)':>12s} "
          f"{'lr*RMS(g)/RMS(w)':>18s}")
    for grp, a in sorted(agg.items()):
        rg = (a["g2"] / a["n"]) ** 0.5
        rw = (a["w2"] / a["n"]) ** 0.5
        rel = args.lr * rg / rw if rw > 0 else float("inf")
        print(f"{grp:12s} {rg:12.3e} {rw:12.3e} {rel:18.3e}")

    if args.steps:
        sched = lambda _: args.lr
        tx = make_optimizer(sched, opt_type=args.opt,
                            momentum=OptimizeParam.optimizer.momentum or 0.9,
                            wd=OptimizeParam.optimizer.wd or 0.0,
                            clip_gradient=OptimizeParam.optimizer
                            .clip_gradient)
        state = TrainState.create(apply_fn=model.apply, params=params, tx=tx,
                                  batch_stats=bs)
        step = make_train_step(model, mesh=None, donate=False,
                               pixel_norm=pixel_norm)
        dev_batch = {"data": jnp.asarray(batch["data"]),
                     "im_info": jnp.asarray(batch["im_info"]),
                     "gt_bbox": jnp.asarray(batch["gt_bbox"])}
        key = jax.random.PRNGKey(3)
        for i in range(args.steps):
            state, losses, _ = step(state, dev_batch,
                                    jax.random.fold_in(key, i))
            if i % 10 == 0 or i == args.steps - 1:
                ls = {k: round(float(np.asarray(v)), 4)
                      for k, v in losses.items()}
                print(f"step {i:4d} {ls}")


if __name__ == "__main__":
    main()
