"""Pallas NMS kernel (interpret mode on CPU) vs the lax.scan reference."""
import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax.numpy as jnp


def test_pallas_nms_matches_scan():
    from simpledet_tpu.kernels.nms_pallas import nms_keep_sorted_pallas
    from simpledet_tpu.ops.nms import nms_keep_sorted

    rng = np.random.RandomState(0)
    n = 200
    xy = rng.uniform(0, 100, (n, 2)).astype(np.float32)
    wh = rng.uniform(5, 50, (n, 2)).astype(np.float32)
    boxes = np.concatenate([xy, xy + wh], 1)
    scores = rng.rand(n).astype(np.float32)
    order = np.argsort(-scores)
    sboxes = jnp.asarray(boxes[order])
    svalid = jnp.asarray(np.ones(n, bool))

    expect = np.asarray(nms_keep_sorted(sboxes, svalid, 0.5))
    got = np.asarray(nms_keep_sorted_pallas(sboxes, svalid, 0.5,
                                            interpret=True))
    np.testing.assert_array_equal(got, expect)


def test_pallas_nms_respects_valid_mask():
    from simpledet_tpu.kernels.nms_pallas import nms_keep_sorted_pallas

    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10], [20, 20, 30, 30]],
                        jnp.float32)
    valid = jnp.asarray([True, False, True])
    keep = np.asarray(nms_keep_sorted_pallas(boxes, valid, 0.5,
                                             interpret=True))
    np.testing.assert_array_equal(keep, [True, False, True])
