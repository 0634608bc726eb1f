"""TSD: deformable pooling offsets, PC losses, tiny e2e."""
import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp


def test_deformable_roi_align_zero_offset_identity():
    from simpledet_tpu.kernels.roi_align import multilevel_roi_align

    rng = np.random.RandomState(0)
    feats = [jnp.asarray(rng.randn(16, 24, 8), jnp.float32),
             jnp.asarray(rng.randn(8, 12, 8), jnp.float32)]
    rois = jnp.asarray([[4, 4, 40, 40]], jnp.float32)
    base = multilevel_roi_align(feats, rois, (4, 8), out_size=7)
    zero_off = jnp.zeros((1, 7, 7, 2))
    same = multilevel_roi_align(feats, rois, (4, 8), out_size=7,
                                bin_offset=zero_off)
    np.testing.assert_allclose(np.asarray(base), np.asarray(same), atol=1e-6)
    # nonzero offsets change the result
    off = jnp.ones((1, 7, 7, 2))
    diff = multilevel_roi_align(feats, rois, (4, 8), out_size=7,
                                bin_offset=off)
    assert not np.allclose(np.asarray(base), np.asarray(diff))


def test_cls_pc_loss_margins():
    from simpledet_tpu.models.tsd import cls_pc_loss

    # tsd much better than sibling -> zero loss
    logits = jnp.asarray([[0.0, 1.0, 0.0]])
    tsd_better = jnp.asarray([[0.0, 10.0, 0.0]])
    lbl = jnp.asarray([1.0])
    assert float(cls_pc_loss(logits, tsd_better, lbl)) == 0.0
    # tsd much worse -> positive loss
    tsd_worse = jnp.asarray([[10.0, 0.0, 0.0]])
    assert float(cls_pc_loss(logits, tsd_worse, lbl)) > 0.0


def test_tsd_e2e_tiny():
    from models.TSD.bbox_head import TSDConvFCBBoxHead
    from models.TSD.faster_rcnn import TSDFasterRcnn
    from models.FPN.builder import (MSRAResNet50V1FPN, FPNNeck, FPNRpnHead,
                                    FPNRoiAlign)

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
            post_nms_top_n = 16
            nms_thr = 0.7
            min_bbox_side = 0

        class subsample_proposal:
            proposal_wo_gt = False
            image_roi = 8
            fg_fraction = 0.5
            fg_thr = 0.5
            bg_thr_hi = 0.5
            bg_thr_lo = 0.0

        class bbox_target:
            num_reg_class = 4
            class_agnostic = False
            weight = (1.0, 1.0, 1.0, 1.0)
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

    class BboxP:
        fp16 = False
        normalizer = None
        num_class = 4
        image_roi = 8
        batch_image = 1
        roi_size = 7

        class regress_target:
            class_agnostic = False
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

        class TSD:
            pc_cls = True
            pc_reg = True
            pc_cls_margin = 0.2
            pc_reg_margin = 0.2

    class RoiP:
        fp16 = False
        normalizer = None
        out_size = 7
        stride = (4, 8, 16, 32)
        roi_canonical_scale = 224
        roi_canonical_level = 4

    det = TSDFasterRcnn()
    model = det.get_train_symbol(
        MSRAResNet50V1FPN(B), FPNNeck(B), FPNRpnHead(RpnP),
        FPNRoiAlign(RoiP), TSDConvFCBBoxHead(BboxP))

    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(1, 64, 96, 3), jnp.float32)
    im_info = jnp.asarray([[64, 96, 1.0]], jnp.float32)
    gt = np.full((1, 6, 5), -1, np.float32)
    gt[0, 0] = [10, 10, 50, 40, 2]
    gt = jnp.asarray(gt)

    v = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        data, im_info, gt, mode="train")

    def loss_fn(params):
        losses, _ = model.apply(
            {"params": params}, data, im_info, gt, mode="train",
            rngs={"sampling": jax.random.PRNGKey(4)})
        return sum(jnp.asarray(x) for x in losses.values()), losses

    (total, losses), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(v["params"])
    assert np.isfinite(float(total)), jax.tree.map(float, losses)
    assert {"tsd_cls_loss", "tsd_reg_loss", "tsd_cls_pc_loss",
            "tsd_reg_pc_loss"} <= set(losses)
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0

    out = jax.jit(lambda p, d, i: model.apply(
        {"params": p}, d, i, mode="test",
        rngs={"sampling": jax.random.PRNGKey(0)}))(v["params"], data, im_info)
    assert out["cls_score"].shape == (1, 16, 4)
