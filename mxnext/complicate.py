"""Compat shim: mxnext.complicate.normalizer_factory -> TPU normalizers."""
from simpledet_tpu.models.norm import normalizer_factory  # noqa: F401
