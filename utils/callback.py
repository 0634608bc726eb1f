"""Compat shim: reference utils/callback.py (Speedometer + checkpointers)."""
from simpledet_tpu.utils.logger import Speedometer  # noqa: F401
from simpledet_tpu.core.checkpoint import save_checkpoint as do_checkpoint  # noqa: F401
