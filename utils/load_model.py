"""Compat shim: reference utils/load_model.py checkpoint helpers."""
from simpledet_tpu.core.checkpoint import (  # noqa: F401
    get_latest_ckpt_epoch,
    load_checkpoint,
    load_pretrain,
    save_checkpoint,
)
