import numpy as np
import jax
import jax.numpy as jnp

from simpledet_tpu.ops.nms import nms, nms_keep_sorted, soft_nms
from tests.oracles import np_greedy_nms
from tests.test_ops_bbox import rand_boxes


def test_nms_matches_oracle():
    rng = np.random.RandomState(0)
    boxes = rand_boxes(64, rng, size=200)
    scores = rng.uniform(0.01, 1.0, 64).astype(np.float32)
    want = np_greedy_nms(boxes, scores, 0.5)
    got_boxes, got_scores, got_idx, got_valid = jax.jit(
        lambda b, s: nms(b, s, 0.5, 64))(jnp.asarray(boxes), jnp.asarray(scores))
    got_idx = np.asarray(got_idx)[np.asarray(got_valid)]
    np.testing.assert_array_equal(np.sort(got_idx), np.sort(want))
    # order: descending score
    kept_scores = np.asarray(got_scores)[np.asarray(got_valid)]
    assert np.all(np.diff(kept_scores) <= 1e-6)


def test_nms_respects_valid_mask_and_padding():
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10, 10], [50, 50, 60, 60]],
                        dtype=jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    valid = jnp.asarray([True, True, False])
    ob, osc, oi, ov = nms(boxes, scores, 0.5, 4, valid=valid)
    ov = np.asarray(ov)
    assert ov.tolist() == [True, False, False, False]
    assert np.asarray(oi)[0] == 0
    np.testing.assert_allclose(np.asarray(ob)[1], 0.0)


def test_nms_keep_sorted_dedups_identical():
    boxes = jnp.tile(jnp.asarray([[0.0, 0.0, 20.0, 20.0]]), (5, 1))
    valid = jnp.ones((5,), dtype=bool)
    keep = np.asarray(nms_keep_sorted(boxes, valid, 0.5))
    assert keep.tolist() == [True, False, False, False, False]


def test_soft_nms_parity_with_native():
    """Device soft-NMS must match the native C++ port of cython cpu_soft_nms
    (reference operator_py/cython/cpu_nms.pyx:97-204) in all three modes:
    same detections, same decayed scores, same selection order."""
    from simpledet_tpu import native
    if not native.NATIVE:
        import pytest
        pytest.skip("no native build")
    rng = np.random.RandomState(7)
    n = 48
    boxes = rand_boxes(n, rng, size=80)  # small canvas -> heavy overlap
    scores = rng.uniform(0.01, 1.0, n).astype(np.float32)
    dets = np.concatenate([boxes, scores[:, None]], axis=1)
    for method, mid in [("linear", 0), ("gaussian", 1), ("hard", 2)]:
        want = native.cpu_soft_nms(dets.copy(), 0.5, 0.3, 0.05, mid)
        ob, osc, oi, ov = jax.jit(
            lambda b, s: soft_nms(b, s, n, thr=0.3, sigma=0.5,
                                  score_thresh=0.05, method=method),
            static_argnames=())(jnp.asarray(boxes), jnp.asarray(scores))
        ov = np.asarray(ov)
        got_boxes = np.asarray(ob)[ov]
        got_scores = np.asarray(osc)[ov]
        assert len(got_scores) == len(want), (method, len(got_scores),
                                              len(want))
        np.testing.assert_allclose(got_boxes, want[:, :4], atol=1e-4,
                                   err_msg=method)
        np.testing.assert_allclose(got_scores, want[:, 4], atol=1e-4,
                                   err_msg=method)


def test_soft_nms_decays_overlapping():
    boxes = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 11, 11], [50, 50, 60, 60]], dtype=jnp.float32)
    scores = jnp.asarray([0.9, 0.85, 0.5])
    ob, osc, oi, ov = soft_nms(boxes, scores, 3, method="gaussian")
    oi = np.asarray(oi)
    # best box first, far box keeps score, overlapped box decayed below 0.85
    assert oi[0] == 0
    osc = np.asarray(osc)
    assert abs(osc[0] - 0.9) < 1e-5
    decayed = osc[oi.tolist().index(1)] if 1 in oi.tolist() else 0.0
    assert decayed < 0.6
