"""LR schedules: warmup + multi-factor step decay, cosine/poly/linear.

Mirrors utils/lr_scheduler.py (WarmupMultiFactorScheduler:5,
AdvancedLRScheduler:92) as optax schedules, plus the reference's
distributed linear-scaling rules (apply_dp_scaling below).
"""
import optax


def apply_dp_scaling(lr, lr_iter, warmup_iter, num_workers, total_iter=None,
                     warmup_in_pct=False):
    """The reference's multi-worker linear-scaling rules
    (detection_train.py:196-213):

      * base lr x num_workers
      * negative lr_iter entries resolve against total_iter
      * lr_iter // num_workers (config boundaries are single-worker counts)
      * warmup iter // num_workers when ``warmup.in_pct`` is set

    Gradient rescaling (1/(ndev*workers)) needs no counterpart here: the
    train step averages the loss over the global batch.

    Returns (scaled_lr, scaled_lr_iter, scaled_warmup_iter).
    """
    num_workers = max(int(num_workers), 1)
    lr_iter = list(lr_iter or [])
    if total_iter is not None:
        lr_iter = [total_iter + it if it < 0 else it for it in lr_iter]
    lr_iter = [it // num_workers for it in lr_iter]
    if warmup_in_pct and warmup_iter:
        warmup_iter = warmup_iter // num_workers
    return lr * num_workers, lr_iter, warmup_iter


def warmup_multifactor(base_lr, lr_iters, factor=0.1, warmup_type="gradual",
                       warmup_lr=None, warmup_iter=0):
    """Step-decay schedule with constant or gradual (linear) warmup."""
    def sched(step):
        import jax.numpy as jnp
        lr = base_lr
        for it in lr_iters:
            lr = jnp.where(step >= it, lr * factor, lr)
        if warmup_iter > 0:
            wlr = warmup_lr if warmup_lr is not None else base_lr / 3.0
            if warmup_type == "constant":
                warm = wlr
            else:  # gradual
                warm = wlr + (base_lr - wlr) * (step / max(warmup_iter, 1))
            lr = jnp.where(step < warmup_iter, warm, lr)
        return lr
    return sched


def sequential(schedules, boundaries):
    """Chain schedules switching at the given step boundaries
    (reference utils/lr_scheduler.py:49 LRSequential)."""
    import jax.numpy as jnp

    def sched(step):
        lr = schedules[0](step)
        for s, b in zip(schedules[1:], boundaries):
            lr = jnp.where(step >= b, s(step - b), lr)
        return lr
    return sched


def advanced(base_lr, total_iter, mode="cosine", offset=0):
    if mode == "cosine":
        return optax.cosine_decay_schedule(base_lr, max(total_iter - offset, 1))
    if mode == "linear":
        return optax.linear_schedule(base_lr, 0.0, max(total_iter - offset, 1))
    if mode == "poly":
        return optax.polynomial_schedule(base_lr, 0.0, 2.0,
                                         max(total_iter - offset, 1))
    raise NotImplementedError(mode)
