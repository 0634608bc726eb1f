"""Compat shim: reference utils/patch_config.py."""
from simpledet_tpu.core.config import patch_config_as_nothrow  # noqa: F401
