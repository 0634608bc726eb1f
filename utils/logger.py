"""Compat shim: reference utils/logger.py."""
from simpledet_tpu.utils.logger import config_logger  # noqa: F401
