import numpy as np
import jax.numpy as jnp

from simpledet_tpu.ops import (
    BBOX_XFORM_CLIP, bbox_overlaps, clip_boxes, decode_boxes, encode_boxes,
    flip_boxes, generate_base_anchors, generate_anchor_grid,
)
from tests.oracles import np_bbox_overlaps, np_decode, np_encode


def rand_boxes(n, rng, size=500):
    x1 = rng.uniform(0, size, n)
    y1 = rng.uniform(0, size, n)
    w = rng.uniform(1, 200, n)
    h = rng.uniform(1, 200, n)
    return np.stack([x1, y1, x1 + w, y1 + h], axis=1).astype(np.float32)


def test_iou_matches_oracle():
    rng = np.random.RandomState(0)
    a, b = rand_boxes(23, rng), rand_boxes(17, rng)
    got = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(b)))
    want = np_bbox_overlaps(a, b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_iou_batched():
    rng = np.random.RandomState(1)
    a = np.stack([rand_boxes(5, rng), rand_boxes(5, rng)])
    b = np.stack([rand_boxes(7, rng), rand_boxes(7, rng)])
    got = np.asarray(bbox_overlaps(jnp.asarray(a), jnp.asarray(b)))
    for i in range(2):
        np.testing.assert_allclose(got[i], np_bbox_overlaps(a[i], b[i]),
                                   rtol=1e-5, atol=1e-6)


def test_encode_decode_roundtrip_and_oracle():
    rng = np.random.RandomState(2)
    ex, gt = rand_boxes(31, rng), rand_boxes(31, rng)
    t = np.asarray(encode_boxes(jnp.asarray(ex), jnp.asarray(gt)))
    np.testing.assert_allclose(t, np_encode(ex, gt), rtol=1e-4, atol=1e-4)
    # decode(ex, encode(ex, gt)) == gt
    back = np.asarray(decode_boxes(jnp.asarray(ex), jnp.asarray(t)))
    np.testing.assert_allclose(back, gt, rtol=1e-3, atol=1e-2)


def test_decode_multiclass_matches_oracle():
    rng = np.random.RandomState(3)
    boxes = rand_boxes(11, rng)
    deltas = rng.randn(11, 12).astype(np.float32) * 0.5
    got = np.asarray(decode_boxes(jnp.asarray(boxes), jnp.asarray(deltas)))
    want = np_decode(boxes.astype(np.float64), deltas.astype(np.float64), BBOX_XFORM_CLIP)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_decode_with_mean_std():
    rng = np.random.RandomState(4)
    boxes = rand_boxes(9, rng)
    raw = rng.randn(9, 4).astype(np.float32) * 0.3
    stds = (0.1, 0.1, 0.2, 0.2)
    means = (0.0, 0.1, 0.0, -0.1)
    got = np.asarray(decode_boxes(jnp.asarray(boxes), jnp.asarray(raw),
                                  means=means, stds=stds))
    unnorm = raw * np.array(stds) + np.array(means)
    want = np_decode(boxes.astype(np.float64), unnorm.astype(np.float64), BBOX_XFORM_CLIP)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


def test_clip_and_flip():
    boxes = jnp.asarray([[-5.0, -3.0, 700.0, 900.0], [10, 10, 20, 20]])
    clipped = np.asarray(clip_boxes(boxes, (600, 800)))
    np.testing.assert_allclose(clipped[0], [0, 0, 700, 599])
    np.testing.assert_allclose(clipped[1], [10, 10, 20, 20])
    flipped = np.asarray(flip_boxes(boxes, 800))
    np.testing.assert_allclose(flipped[1], [779, 10, 789, 20])


def test_base_anchors_parity_stride16():
    """Exact values per the reference rounding for stride 16, scales (8,),
    aspects (0.5, 1, 2) — the canonical Faster R-CNN anchors."""
    a = generate_base_anchors(16, (8,), (0.5, 1.0, 2.0))
    # w_ratios = round(sqrt(256/aspect)); aspect .5 -> 23, 1 -> 16, 2 -> 11
    # h_ratios = round(w*aspect): 12, 16, 22 ; scaled by 8: (184,96),(128,128),(88,176)
    want = np.array([
        [7.5 - 0.5 * 183, 7.5 - 0.5 * 95, 7.5 + 0.5 * 183, 7.5 + 0.5 * 95],
        [7.5 - 0.5 * 127, 7.5 - 0.5 * 127, 7.5 + 0.5 * 127, 7.5 + 0.5 * 127],
        [7.5 - 0.5 * 87, 7.5 - 0.5 * 175, 7.5 + 0.5 * 87, 7.5 + 0.5 * 175],
    ], dtype=np.float32)
    np.testing.assert_allclose(a, want)


def test_anchor_grid_layout():
    g = generate_anchor_grid(2, 3, 16, (8,), (0.5, 1.0, 2.0))
    assert g.shape == (2 * 3 * 3, 4)
    base = generate_base_anchors(16, (8,), (0.5, 1.0, 2.0))
    # first cell == base anchors, second cell shifted by stride in x
    np.testing.assert_allclose(g[:3], base)
    np.testing.assert_allclose(g[3:6], base + np.array([16, 0, 16, 0], np.float32))
    # row stride: cell (y=1, x=0) at index 3*3
    np.testing.assert_allclose(g[9:12], base + np.array([0, 16, 0, 16], np.float32))
