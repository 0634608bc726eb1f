"""Compat shim: reference utils/lr_scheduler.py scheduler surface, backed by
simpledet_tpu.core.schedule (optax schedules)."""
from simpledet_tpu.core.schedule import (  # noqa: F401
    advanced as AdvancedLRScheduler,
    sequential as LRSequential,
    warmup_multifactor as WarmupMultiFactorScheduler,
)
