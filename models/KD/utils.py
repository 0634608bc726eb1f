"""Compat shim: reference models/KD/utils.py teacher creation, backed by
simpledet_tpu.models.kd.make_teacher_fn."""
from simpledet_tpu.models.kd import make_teacher_fn  # noqa: F401


def create_teacher_module(teacher_module, teacher_params, stage="c4"):
    """Returns a jitted frozen-teacher feature fn (reference created a
    second DetModule; here a jitted apply suffices)."""
    return make_teacher_fn(teacher_module, teacher_params, stage)
