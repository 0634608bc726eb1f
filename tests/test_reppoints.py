"""RepPoints: point ops vs the reference's own __main__ fixtures
(point_ops.py:283-322) + tiny e2e."""
import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp


def test_gen_offsets_matches_reference_fixture():
    from simpledet_tpu.ops.points import gen_dcn_offsets
    expect = np.array([-1, -1, -1, 0, -1, 1, 0, -1, 0, 0,
                       0, 1, 1, -1, 1, 0, 1, 1], np.float32)
    got = gen_dcn_offsets(3, 1).reshape(-1)
    np.testing.assert_array_equal(got, expect)


def test_gen_points_matches_reference_fixture():
    from simpledet_tpu.ops.points import gen_points
    got = gen_points(2, 3, 8)
    expect = np.array([[0, 0, 8], [8, 0, 8], [16, 0, 8],
                       [0, 8, 8], [8, 8, 8], [16, 8, 8]], np.float32)
    np.testing.assert_array_equal(got, expect)


def test_points2bbox_matches_reference_fixture():
    from simpledet_tpu.ops.points import points2bbox
    # reference fixture: pts arange(36) reshaped (1, 18, 2, 1) NCHW ->
    # here channel-last [2, 18]: per spatial pos, 18 channels
    pts_nchw = np.arange(36).reshape(1, 18, 2, 1).astype(np.float32)
    pts = np.transpose(pts_nchw, (0, 2, 3, 1)).reshape(2, 18)
    got = np.asarray(points2bbox(jnp.asarray(pts), "minmax", y_first=True))
    # expected (reference): per position [x1, y1, x2, y2]
    expect = np.array([[2, 0, 34, 32], [3, 1, 35, 33]], np.float32)
    np.testing.assert_array_equal(got, expect)


def test_point_assign_matches_reference_fixture():
    from simpledet_tpu.ops.points import gen_points, point_assign
    pts = np.concatenate([gen_points(64 // s, 128 // s, s)
                          for s in (32, 64)], 0)
    gt = jnp.asarray([[63, 923, 123, 1800, 2], [200, 50, 600, 120, 3],
                      [21, 456, 123, 712, 4], [325, 123, 523, 612, 5],
                      [-1, -1, 5000, 5000, 6]], jnp.float32)
    label, gts = point_assign(jnp.asarray(pts), gt, scale=4, num_pos=1)
    expect_l = [-1, -1, -1, -1, -1, -1, 4, 3, -1, 6]
    np.testing.assert_array_equal(np.asarray(label), expect_l)
    np.testing.assert_allclose(np.asarray(gts)[6], [21, 456, 123, 712])
    np.testing.assert_allclose(np.asarray(gts)[9], [-1, -1, 5000, 5000])


def test_iou_assign_matches_reference_fixture():
    from simpledet_tpu.ops.points import iou_assign
    proposals = jnp.asarray([[45, 23, 452, 45], [12, 798, 45, 902],
                             [103, 563, 345, 609], [34, 452, 123, 623],
                             [12, 23, 43, 134], [341, 78, 587, 102]],
                            jnp.float32)
    gt = jnp.asarray([[63, 923, 123, 1800, 2], [200, 50, 600, 120, 3],
                      [21, 456, 123, 712, 4]], jnp.float32)
    label, gts = iou_assign(proposals, gt, 0.5, 0.4, 0.0)
    np.testing.assert_array_equal(np.asarray(label), [0, 0, 0, 4, 0, 3])
    np.testing.assert_allclose(np.asarray(gts)[3], [21, 456, 123, 712])


def test_reppoints_e2e_tiny():
    from models.RepPoints.builder import (RepPointsDetector, RepPointsHead,
                                          FCOSFPNNeck, MSRAResNet50V1FPN)

    class B:
        fp16 = False
        normalizer = None

    class P:
        num_class = 1 + 3
        fp16 = False
        normalizer = None
        batch_image = 1

        class point_generate:
            num_points = 9
            scale = 4
            stride = (8, 16, 32, 64, 128)
            transform = "moment"

        class head:
            conv_channel = 32
            point_conv_channel = 32

        class proposal:
            pre_nms_top_n = 50
            min_det_score = 0.05

        class point_target:
            target_scale = 4
            num_pos = 1

        class bbox_target:
            pos_iou_thr = 0.5
            neg_iou_thr = 0.4
            min_pos_iou = 0.0

        class focal_loss:
            alpha = 0.25
            gamma = 2.0

    det = RepPointsDetector()
    model = det.get_train_symbol(MSRAResNet50V1FPN(B), FCOSFPNNeck(B),
                                 RepPointsHead(P))
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(1, 64, 96, 3), jnp.float32)
    im_info = jnp.asarray([[64, 96, 1.0]], jnp.float32)
    gt = np.full((1, 5, 5), -1, np.float32)
    gt[0, 0] = [10, 10, 50, 40, 2]
    gt = jnp.asarray(gt)
    v = model.init({"params": jax.random.PRNGKey(0)}, data, im_info, gt,
                   mode="train")

    def loss_fn(params):
        losses, _ = model.apply({"params": params}, data, im_info, gt,
                                mode="train")
        return sum(jnp.asarray(x) for x in losses.values()), losses

    (total, losses), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(v["params"])
    assert np.isfinite(float(total)), jax.tree.map(float, losses)
    assert {"reppoints_cls_loss", "reppoints_init_loss",
            "reppoints_refine_loss"} <= set(losses)
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
    # moment transfer param exists and receives gradient
    assert "moment_transfer" in v["params"]

    out = jax.jit(lambda p, d, i: model.apply({"params": p}, d, i,
                                              mode="test"))(
        v["params"], data, im_info)
    k = out["cls_score"].shape[1]
    assert out["cls_score"].shape == (1, k, 4)
