"""MS R-CNN maskiou + KD FitNet: semantics + tiny e2e steps."""
import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp


def test_polygon_area_shoelace():
    from simpledet_tpu.data.mask_transforms import polys_to_edges
    from simpledet_tpu.models.msrcnn import polygon_area

    sq = np.array([0, 0, 10, 0, 10, 10, 0, 10], np.float32)
    edges = polys_to_edges([sq], 16)
    assert float(polygon_area(jnp.asarray(edges))) == pytest.approx(100.0)
    # two disjoint squares sum
    sq2 = np.array([20, 20, 24, 20, 24, 24, 20, 24], np.float32)
    edges2 = polys_to_edges([sq, sq2], 20)
    assert float(polygon_area(jnp.asarray(edges2))) == pytest.approx(116.0)


def test_maskiou_target_perfect_prediction():
    from simpledet_tpu.data.mask_transforms import polys_to_edges
    from simpledet_tpu.models.msrcnn import maskiou_target
    from simpledet_tpu.targets.mask_target import rasterize_edges

    sq = np.array([10, 10, 50, 50, 50, 10, 10, 50], np.float32)
    sq = np.array([10, 10, 50, 10, 50, 50, 10, 50], np.float32)
    edges = polys_to_edges([sq], 16)
    roi = np.array([10, 10, 50, 50], np.float32)
    tgt = rasterize_edges(jnp.asarray(edges), jnp.asarray(roi), 28)

    gt_poly = jnp.asarray(edges)[None]
    iou, w = maskiou_target(
        tgt[None], tgt[None], jnp.asarray(roi)[None], gt_poly,
        jnp.asarray([0]), jnp.asarray([True]))
    # roi == gt box: predicted == target == full instance -> IoU ~ 1
    assert float(iou[0]) > 0.9
    assert float(w[0]) == 1.0


def _mask_param_stack(num_class=4):
    class B:
        fp16 = False
        normalizer = None

    class RpnP:
        fp16 = False
        normalizer = None
        batch_image = 1

        class anchor_generate:
            scale = (8,)
            ratio = (0.5, 1.0, 2.0)
            stride = (4, 8, 16, 32, 64)
            image_anchor = 32

        class anchor_assign:
            allowed_border = 0
            pos_thr = 0.7
            neg_thr = 0.3
            min_pos_thr = 0.0
            image_anchor = 32
            pos_fraction = 0.5

        class head:
            conv_channel = 32
            mean = (0, 0, 0, 0)
            std = (1, 1, 1, 1)

        class proposal:
            pre_nms_top_n = 64
            post_nms_top_n = 32
            nms_thr = 0.7
            min_bbox_side = 0

        class subsample_proposal:
            proposal_wo_gt = False
            image_roi = 16
            fg_fraction = 0.5
            fg_thr = 0.5
            bg_thr_hi = 0.5
            bg_thr_lo = 0.0

        class bbox_target:
            num_reg_class = num_class
            class_agnostic = False
            weight = (1.0, 1.0, 1.0, 1.0)
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

    class BboxP:
        fp16 = False
        normalizer = None
        num_class = 4
        image_roi = 16
        batch_image = 1

        class regress_target:
            class_agnostic = False
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

    class MaskP:
        fp16 = False
        normalizer = None
        resolution = 14
        dim_reduced = 32
        num_fg_roi = 8

    class RoiP:
        fp16 = False
        normalizer = None
        out_size = 7
        stride = (4, 8, 16, 32)
        roi_canonical_scale = 224
        roi_canonical_level = 4

    class TestP:
        min_det_score = 0.01
        max_det_per_image = 10

        class nms:
            type = "nms"
            thr = 0.5

    return B, RpnP, BboxP, MaskP, RoiP, TestP


def test_msrcnn_e2e_tiny():
    from models.msrcnn.builder import (
        MaskScoringFasterRcnn, MaskIoUConvHead, MaskFPNRpnHead,
        MaskFasterRcnn4ConvHead, BboxPostProcessor, MSRAResNet50V1FPN,
        FPNNeck, FPNRoiAlign, FPNBbox2fcHead)
    from simpledet_tpu.data.mask_transforms import polys_to_edges

    B, RpnP, BboxP, MaskP, RoiP, TestP = _mask_param_stack()
    det = MaskScoringFasterRcnn()
    args = (MSRAResNet50V1FPN(B), FPNNeck(B), MaskFPNRpnHead(RpnP, MaskP),
            FPNRoiAlign(RoiP), FPNRoiAlign(RoiP), FPNBbox2fcHead(BboxP),
            MaskFasterRcnn4ConvHead(BboxP, MaskP, RoiP),
            MaskIoUConvHead(TestP, BboxP, MaskP))
    model = det.get_train_symbol(*args)

    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(1, 64, 96, 3), jnp.float32)
    im_info = jnp.asarray([[64, 96, 1.0]], jnp.float32)
    gt = np.full((1, 6, 5), -1, np.float32)
    gt[0, 0] = [10, 10, 50, 40, 2]
    sq = np.array([10, 10, 50, 10, 50, 40, 10, 40], np.float32)
    poly = np.full((1, 6, 20, 5), -1, np.float32)
    poly[0, 0] = polys_to_edges([sq], 20)

    v = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        data, im_info, jnp.asarray(gt), jnp.asarray(poly), mode="train")

    def loss_fn(params):
        losses, _ = model.apply(
            {"params": params}, data, im_info, jnp.asarray(gt),
            jnp.asarray(poly), mode="train",
            rngs={"sampling": jax.random.PRNGKey(2)})
        return sum(jnp.asarray(x) for x in losses.values()), losses

    (total, losses), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(v["params"])
    assert np.isfinite(float(total)), jax.tree.map(float, losses)
    assert "maskiou_loss" in losses and "mask_loss" in losses
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0

    test_model = det.get_test_symbol(*args, BboxPostProcessor(TestP))
    out = jax.jit(lambda p, d, i: test_model.apply(
        {"params": p}, d, i, mode="test",
        rngs={"sampling": jax.random.PRNGKey(0)}))(v["params"], data, im_info)
    assert out["mask_score"].shape == (1, 10)
    assert out["mask_prob"].shape == (1, 10, 14, 14)


def test_kd_fitnet_tiny():
    from models.KD.builder import FitNetFasterRcnn, FitNetHead
    from models.FPN.builder import (MSRAResNet50V1FPN, FPNNeck, FPNRpnHead,
                                    FPNRoiAlign, FPNBbox2fcHead)
    from models.KD.utils import create_teacher_module
    from simpledet_tpu.models.resnet import ResNet
    from simpledet_tpu.models.norm import normalizer_factory

    B, RpnP, BboxP, MaskP, RoiP, TestP = _mask_param_stack()

    class KDP:
        channel = 64
        stage = "c4"
        grad_scale = 1.0

    det = FitNetFasterRcnn()
    model = det.get_train_symbol(
        MSRAResNet50V1FPN(B), FPNNeck(B), FPNRpnHead(RpnP),
        FPNRoiAlign(RoiP), FPNBbox2fcHead(BboxP), FitNetHead(KDP))

    # teacher: a small resnet producing a 64-ch c4 surrogate
    teacher = ResNet(depth=18, variant="v1",
                     norm=normalizer_factory("fixbn"), num_stages=3)
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(1, 64, 96, 3), jnp.float32)
    tv = teacher.init(jax.random.PRNGKey(9), data)

    def teacher_fn(d):
        f = teacher.apply(tv, d)
        # adapt channels to KDP.channel for the hint loss
        return f["c4"][..., :64]

    teacher_label = teacher_fn(data)

    im_info = jnp.asarray([[64, 96, 1.0]], jnp.float32)
    gt = np.full((1, 6, 5), -1, np.float32)
    gt[0, 0] = [10, 10, 50, 40, 2]
    gt = jnp.asarray(gt)
    v = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        data, im_info, gt, teacher_label=teacher_label, mode="train")

    def loss_fn(params):
        losses, _ = model.apply(
            {"params": params}, data, im_info, gt,
            teacher_label=teacher_label, mode="train",
            rngs={"sampling": jax.random.PRNGKey(2)})
        return sum(jnp.asarray(x) for x in losses.values()), losses

    (total, losses), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(v["params"])
    assert np.isfinite(float(total))
    assert "fit_loss" in losses and float(losses["fit_loss"]) > 0
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
