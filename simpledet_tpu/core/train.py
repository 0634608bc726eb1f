"""Train engine: jitted fwd+bwd+update step over a device mesh.

The TPU rewrite of DetModule.fit (reference core/detection_module.py:892-1060):
one jit-compiled function does forward, backward, gradient all-reduce (via
batch sharding over the mesh 'data' axis) and the SGD update — replacing the
executor group + kvstore push/pull machinery entirely.
"""
import functools
from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax
from flax.training import train_state

from simpledet_tpu.parallel.mesh import data_sharding, replicated


class TrainState(train_state.TrainState):
    # running BN statistics (SyncBN's moving mean/var collection); None for
    # models without stateful normalizers
    batch_stats: Any = None


def create_train_state(rng, model, example_batch, tx):
    variables = model.init(
        {"params": rng, "sampling": jax.random.fold_in(rng, 1)},
        example_batch["data"], example_batch["im_info"],
        example_batch["gt_bbox"], mode="train")
    params = variables["params"]
    return TrainState.create(apply_fn=model.apply, params=params, tx=tx,
                             batch_stats=variables.get("batch_stats") or None)


def make_train_step(model, mesh=None, donate=True, remat=False,
                    quantize=None, pixel_norm=None):
    """Returns step(state, batch, rng) -> (state, losses, aux).

    batch: dict with data [B,H,W,3], im_info [B,3], gt_bbox [B,G,5]; sharded
    over the mesh 'data' axis. Loss is averaged over the global batch, so
    gradients match the reference's rescale_grad=1/(ndev*nworker) semantics.

    pixel_norm: optional (mean, std) from a deferred Norm2DImage — uint8
    batches are normalized on-device at the top of the step (fused by XLA,
    ops/image.py); float batches pass through unchanged.

    remat=True enables gradient checkpointing on the forward pass (the TPU
    equivalent of the reference's memonger mirror planning,
    utils/memonger_v2.py): matmul/conv outputs are kept, everything else is
    rematerialized in the backward pass. remat="stageN" is the
    memonger_until analog (reference utils/memonger_v2.py:171-226
    make_mirror_plan_to_layer): only backbone stage exits from stageN
    onward are saved (they carry checkpoint_name tags, models/resnet.py);
    activations before the named stage are recomputed in the backward
    pass, giving the largest memory saving for the batch-size sweep.

    quantize: None, or a dict of quantize_apply kwargs (e.g. {} for 8-bit
    defaults) — INT8 QAT, the analog of the reference's
    attach_quantize_node graph rewrite (detection_train.py:145-152).
    """
    if quantize is not None:
        from simpledet_tpu.ops.quant import quantize_apply
        apply_fn = quantize_apply(model.apply, **quantize)
    else:
        apply_fn = model.apply

    def step(state, batch, rng):
        has_bs = state.batch_stats is not None  # static at trace time
        if pixel_norm is not None:
            from simpledet_tpu.ops.image import device_normalize
            batch = dict(batch)
            batch["data"] = device_normalize(batch["data"], batch["im_info"],
                                             *pixel_norm)

        def loss_fn(params):
            extra = {k: v for k, v in batch.items()
                     if k not in ("data", "im_info", "gt_bbox")}
            def fwd(p, bs, data, im_info, gt_bbox, extra_):
                variables = {"params": p}
                if has_bs:
                    # stateful normalizers (SyncBN running stats): collect
                    # the EMA-updated collection alongside the outputs
                    variables["batch_stats"] = bs
                    (losses, aux), mut = apply_fn(
                        variables, data, im_info, gt_bbox, mode="train",
                        rngs={"sampling": rng}, mutable=["batch_stats"],
                        **extra_)
                    return losses, aux, mut.get("batch_stats", bs)
                losses, aux = apply_fn(
                    variables, data, im_info, gt_bbox, mode="train",
                    rngs={"sampling": rng}, **extra_)
                return losses, aux, None

            if remat:
                if isinstance(remat, str):
                    # memonger_until: save only stage exits >= the named
                    # stage (plus everything outside the remat wrapper);
                    # earlier activations recompute in the backward pass
                    n0 = int(remat.replace("stage", ""))
                    names = tuple(f"stage{i}" for i in range(n0, 5))
                    policy = jax.checkpoint_policies.save_only_these_names(
                        *names)
                else:
                    policy = (jax.checkpoint_policies
                              .dots_with_no_batch_dims_saveable)
                fwd = jax.checkpoint(fwd, policy=policy)
            losses, aux, new_bs = fwd(params, state.batch_stats,
                                      batch["data"], batch["im_info"],
                                      batch["gt_bbox"], extra)
            total = sum(jnp.asarray(v, jnp.float32) for v in losses.values())
            return total, (losses, aux, new_bs)

        grads, (losses, aux, new_bs) = jax.grad(
            loss_fn, has_aux=True)(state.params)
        new_state = state.apply_gradients(grads=grads)
        if has_bs:
            new_state = new_state.replace(batch_stats=new_bs)
        losses = {k: v for k, v in losses.items()}
        losses["total_loss"] = sum(losses.values())
        return new_state, losses, aux

    if mesh is None:
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    batch_sh = data_sharding(mesh)
    rep = replicated(mesh)
    return jax.jit(
        step,
        in_shardings=(rep, batch_sh, rep),
        donate_argnums=(0,) if donate else (),
    )
