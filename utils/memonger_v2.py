"""Compat shim: reference utils/memonger_v2.py (gradient-checkpoint
planning). The TPU equivalent is jax.checkpoint rematerialization, enabled
per-config via ModelParam.memonger and applied in
simpledet_tpu/core/train.make_train_step(remat=True) with the
dots-saveable policy (matmul/conv outputs kept, elementwise recomputed).
The reference's threshold/layer planners are unnecessary: XLA schedules
the rematerialized graph itself."""
from simpledet_tpu.core.train import make_train_step  # noqa: F401


def make_mirror_plan(*args, **kw):
    raise NotImplementedError(
        "Set ModelParam.memonger = True instead; rematerialization is a "
        "jax.checkpoint policy, not a graph rewrite (see module docstring).")


make_mirror_plan_to_layer = make_mirror_plan
search_plan_to_layer = make_mirror_plan
