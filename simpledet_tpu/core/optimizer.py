"""Optimizer assembly: SGD-momentum + wd + grad clip + param freezing.

Mirrors the reference optimizer setup (detection_train.py:261-272: sgd,
momentum, wd, rescale_grad, clip) and DetModule's partial-name param
freezing (core/detection_module.py:102-113: any param whose name contains a
fixed_param substring is frozen, unless it matches excluded_param).
"""
import flax
import jax.numpy as jnp
import optax


def freeze_mask(params, fixed_param, excluded_param=None):
    """Pytree of bools: True = trainable. Partial substring matching on the
    '/'-joined param path, like the reference."""
    fixed = list(fixed_param or [])
    excluded = list(excluded_param or [])
    flat = flax.traverse_util.flatten_dict(params)
    mask = {}
    for path in flat:
        name = "/".join(str(p) for p in path)
        frozen = any(f in name for f in fixed)
        if frozen and excluded and any(e in name for e in excluded):
            frozen = False
        mask[path] = not frozen
    return flax.traverse_util.unflatten_dict(mask)


def make_optimizer(lr_schedule, *, opt_type="sgd", momentum=0.9, wd=1e-4,
                   clip_gradient=None, trainable_mask=None):
    """opt_type: 'sgd' (reference default), 'adam', or 'adamw' (the
    reference config schema's OptimizeParam.optimizer.type accepts any
    MXNet optimizer name, doc/fully_annotated_config.py; adam is the
    useful second choice — e.g. focal-loss overfit recipes where SGD's
    fixed scale stalls on the tiny /fg_count-normalized gradients).
    Unrecognized names raise rather than silently training with SGD.

    Weight-decay semantics: for 'sgd' and 'adam', wd is L2-into-gradient
    (added BEFORE the optimizer update — for sgd this matches mxnet
    exactly; for adam it is classic L2-regularized adam, NOT decoupled).
    'adamw' selects optax.adamw for decoupled decay. Frozen params are
    never decayed in any mode."""
    if opt_type not in ("sgd", "adam", "adamw"):
        raise ValueError(
            f"unsupported optimizer.type {opt_type!r}; "
            "supported: sgd, adam, adamw")
    chain = []
    if clip_gradient:
        chain.append(optax.clip(clip_gradient))
    decay_mask = trainable_mask if trainable_mask is not None else None
    if wd and opt_type != "adamw":
        # mxnet sgd adds wd*w to the gradient before momentum — and does NOT
        # decay frozen params
        chain.append(optax.add_decayed_weights(wd, mask=decay_mask))
    if opt_type == "adam":
        chain.append(optax.adam(lr_schedule))
    elif opt_type == "adamw":
        chain.append(optax.adamw(lr_schedule, weight_decay=wd or 0.0,
                                 mask=decay_mask))
    else:
        chain.append(optax.sgd(lr_schedule, momentum=momentum))
    tx = optax.chain(*chain)
    if trainable_mask is not None:
        import jax
        labels = jax.tree.map(lambda t: "train" if t else "freeze",
                              trainable_mask)
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels)
    return tx
