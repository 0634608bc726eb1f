"""Compat shim: reference utils/memonger_v2.py (gradient-checkpoint
planning). The TPU equivalents:

  * Manual knobs — `ModelParam.memonger = True` (dots-saveable
    jax.checkpoint policy) and `ModelParam.memonger_until = "stageN"`
    (save only backbone stage exits >= N), applied in
    simpledet_tpu/core/train.make_train_step. These mirror
    make_mirror_plan / make_mirror_plan_to_layer (reference :29/:171).
  * Automatic search — `ModelParam.memonger_budget_gb = G` bisects remat
    policies by compiled peak HBM (XLA buffer assignment) until the step
    fits the budget: simpledet_tpu/core/memonger.plan_remat, the analog
    of search_plan_to_layer (reference :226), wired in
    detection_train.py.

The reference's threshold search mutates a symbolic graph with
__force_mirroring__ attributes; here a plan is just a policy value, so
the searched object is the policy and the cost model is the compiler's
own accounting instead of a symbol-walk estimate.
"""
from simpledet_tpu.core.memonger import (  # noqa: F401
    CANDIDATES,
    peak_hbm_bytes,
    plan_remat,
)
from simpledet_tpu.core.train import make_train_step  # noqa: F401


def make_mirror_plan(*args, **kw):
    raise TypeError(
        "MXNet symbol rewrites don't exist here. Set "
        "ModelParam.memonger = True (or memonger_until='stageN') for a "
        "fixed plan, or ModelParam.memonger_budget_gb = G to auto-search "
        "one (simpledet_tpu.core.memonger.plan_remat).")


make_mirror_plan_to_layer = make_mirror_plan


def search_plan_to_layer(make_step, state, batch, rng, budget_gb, **kw):
    """Budget-driven plan search (reference :226 search_plan_to_layer):
    returns the lightest remat setting fitting budget_gb. See
    simpledet_tpu.core.memonger.plan_remat for the full contract."""
    setting, peak, history = plan_remat(
        make_step, state, batch, rng, int(float(budget_gb) * 2 ** 30), **kw)
    return setting
