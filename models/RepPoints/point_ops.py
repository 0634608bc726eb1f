"""Compat shim: reference models/RepPoints/point_ops.py, backed by
simpledet_tpu.ops.points (jnp)."""
from simpledet_tpu.ops.points import (  # noqa: F401
    gen_dcn_offsets as _gen_offsets,
    gen_points as _gen_points,
    iou_assign as _iou_assign,
    offset_to_pts as _offset_to_pts,
    point_assign as _point_assign,
    points2bbox as _points2bbox,
)
