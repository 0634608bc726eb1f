"""Native C++ host kernels vs the jnp device implementations."""
import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax.numpy as jnp


@pytest.fixture(scope="module")
def native():
    import simpledet_tpu.native as native
    return native


def test_builds_native(native):
    assert native.NATIVE, "C++ extension should compile in this image"


def test_cpu_nms_matches_device(native):
    from simpledet_tpu.ops.nms import nms

    rng = np.random.RandomState(0)
    n = 60
    xy = rng.uniform(0, 80, (n, 2))
    wh = rng.uniform(5, 40, (n, 2))
    dets = np.concatenate([xy, xy + wh, rng.rand(n, 1)], 1).astype(np.float32)

    keep_native = sorted(native.cpu_nms(dets, 0.5).tolist())
    _, _, idx, valid = nms(jnp.asarray(dets[:, :4]),
                           jnp.asarray(dets[:, 4]), 0.5, n)
    keep_device = sorted(np.asarray(idx)[np.asarray(valid)].tolist())
    assert keep_native == keep_device


def test_bbox_overlaps_matches_device(native):
    from simpledet_tpu.ops.bbox import bbox_overlaps

    rng = np.random.RandomState(1)
    b = rng.uniform(0, 50, (10, 4)).astype(np.float32)
    b[:, 2:] += b[:, :2]
    q = rng.uniform(0, 50, (7, 4)).astype(np.float32)
    q[:, 2:] += q[:, :2]
    got = native.bbox_overlaps(b, q)
    expect = np.asarray(bbox_overlaps(jnp.asarray(b), jnp.asarray(q)))
    np.testing.assert_allclose(got, expect, atol=1e-5)


def test_soft_nms_decays_scores(native):
    dets = np.array([[0, 0, 10, 10, 0.9],
                     [1, 1, 11, 11, 0.8],
                     [50, 50, 60, 60, 0.7]], np.float32)
    out = native.cpu_soft_nms(dets, 0.5, 0.3, 0.001, 1)
    assert out.shape[1] == 5
    # overlapping box's score decayed, distinct box untouched
    scores = sorted(out[:, 4].tolist(), reverse=True)
    assert scores[0] == pytest.approx(0.9)
    assert any(abs(s - 0.7) < 1e-5 for s in scores)
    assert all(s < 0.8 - 1e-5 or abs(s - 0.9) < 1e-6 for s in scores
               if s != 0.7)


def test_rasterize_polygons_matches_device(native):
    from simpledet_tpu.data.mask_transforms import polys_to_edges
    from simpledet_tpu.targets.mask_target import rasterize_edges

    sq = np.array([4, 4, 20, 4, 20, 16, 4, 16], np.float64)
    m = native.rasterize_polygons([sq], 24, 28)
    assert m.shape == (24, 28)
    assert m[10, 10] == 1 and m[0, 0] == 0
    # compare against the device rasterizer on the same grid
    edges = polys_to_edges([sq.astype(np.float32)], 8)
    dev = np.asarray(rasterize_edges(jnp.asarray(edges),
                                     jnp.asarray([0., 0., 28., 24.]), 24))
    # device grid is 24x24 over a 28x24 window; compare interior agreement
    inter = m[:24, :24]
    agree = (dev[:24, :24] == inter[:24, :24]).mean()
    assert agree > 0.9
