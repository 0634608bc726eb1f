"""TridentNet: weight sharing across branches, scale-aware filtering,
tiny e2e train/test."""
import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp


def test_filter_gt_by_range():
    from simpledet_tpu.models.tridentnet import filter_gt_by_range

    gt = jnp.asarray([
        [0, 0, 19, 19, 1],        # sqrt area 20 -> small
        [0, 0, 119, 119, 2],      # sqrt area 120 -> large
        [-1, -1, -1, -1, -1],     # padding
    ], jnp.float32)
    out = filter_gt_by_range(gt, jnp.asarray([0., 90.]))
    assert float(out[0, 4]) == 1 and float(out[1, 4]) == -1
    assert float(out[2, 4]) == -1
    out2 = filter_gt_by_range(gt, jnp.asarray([90., 1e5]))
    assert float(out2[0, 4]) == -1 and float(out2[1, 4]) == 2


def test_trident_backbone_weight_sharing():
    from simpledet_tpu.models.tridentnet import TridentResNetV2C4
    from simpledet_tpu.models.norm import normalizer_factory

    bb = TridentResNetV2C4(depth=50, norm=normalizer_factory("fixbn"),
                           num_branch=3)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
    v = bb.init(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda p, a: bb.apply(p, a))(v, x)
    # 3 branches folded into batch; c4 stride 16
    assert out["c4"].shape == (3, 4, 4, 1024)
    # stage3 units exist ONCE (shared weights), not per branch
    names = set(v["params"].keys())
    assert "stage3_unit1" in names
    assert not any(n.startswith("stage3_unit1_") for n in names)
    # identical input + dilation 1 vs others differ (non-trivial compute)
    assert not np.allclose(np.asarray(out["c4"][0]), np.asarray(out["c4"][1]))


def test_trident_e2e_tiny():
    from models.tridentnet.builder import (TridentFasterRcnn,
                                           TridentMXNetResNetV2,
                                           TridentRpnHead, BboxC5Head)
    from symbol.builder import Neck, RoiAlign

    class B:
        depth = 50
        fp16 = False
        normalizer = None

        class trident:
            num_branch = 3

    class RpnP:
        fp16 = False
        normalizer = None
        batch_image = 3  # batch * branches

        class anchor_generate:
            scale = (2, 4, 8)
            ratio = (0.5, 1.0, 2.0)
            stride = (16,)
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
        depth = 50
        image_roi = 8
        batch_image = 3

        class regress_target:
            class_agnostic = False
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

    class RoiP:
        fp16 = False
        normalizer = None
        out_size = 7
        stride = 16

    class NeckP:
        fp16 = False
        normalizer = None

    det = TridentFasterRcnn()
    model = det.get_train_symbol(
        TridentMXNetResNetV2(B), Neck(NeckP), TridentRpnHead(RpnP),
        RoiAlign(RoiP), BboxC5Head(BboxP), num_branch=3, scaleaware=True,
        valid_ranges=[(0, 90), (30, 160), (90, -1)])

    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(1, 64, 96, 3), jnp.float32)
    im_info = jnp.asarray([[64, 96, 1.0]], jnp.float32)
    gt = np.full((1, 6, 5), -1, np.float32)
    gt[0, 0] = [10, 10, 50, 40, 2]     # sqrt area ~35 -> branches 1+2
    gt = jnp.asarray(gt)

    v = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        data, im_info, gt, mode="train")

    def loss_fn(params):
        losses, _ = model.apply(
            {"params": params}, data, im_info, gt, mode="train",
            rngs={"sampling": jax.random.PRNGKey(3)})
        return sum(jnp.asarray(x) for x in losses.values()), losses

    (total, losses), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(v["params"])
    assert np.isfinite(float(total)), jax.tree.map(float, losses)
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0

    out = jax.jit(lambda p, d, i: model.apply(
        {"params": p}, d, i, mode="test",
        rngs={"sampling": jax.random.PRNGKey(0)}))(v["params"], data, im_info)
    # branches folded into detections: nb * post_nms
    assert out["cls_score"].shape == (1, 48, 4)
    assert out["bbox_xyxy"].shape == (1, 48, 16)


def test_trident_mask_e2e_tiny():
    from models.tridentnet.builder import (TridentMaskRcnn,
                                           TridentMXNetResNetV2,
                                           TridentRpnHead, BboxC5Head)
    from models.maskrcnn.builder import MaskFasterRcnn4ConvHead
    from symbol.builder import Neck, RoiAlign
    from simpledet_tpu.data.mask_transforms import polys_to_edges

    class B:
        depth = 50
        fp16 = False
        normalizer = None

        class trident:
            num_branch = 3

    class RpnP:
        fp16 = False
        normalizer = None
        batch_image = 3

        class anchor_generate:
            scale = (2, 4, 8)
            ratio = (0.5, 1.0, 2.0)
            stride = (16,)
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
        depth = 50
        image_roi = 8
        batch_image = 3

        class regress_target:
            class_agnostic = False
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

    class MaskP:
        fp16 = False
        normalizer = None
        resolution = 14
        dim_reduced = 32
        num_fg_roi = 4

    class RoiP:
        fp16 = False
        normalizer = None
        out_size = 7
        stride = 16

    class NeckP:
        fp16 = False
        normalizer = None

    det = TridentMaskRcnn()
    model = det.get_train_symbol(
        TridentMXNetResNetV2(B), Neck(NeckP), TridentRpnHead(RpnP),
        RoiAlign(RoiP), RoiAlign(RoiP), BboxC5Head(BboxP),
        MaskFasterRcnn4ConvHead(BboxP, MaskP, RoiP),
        num_branch=3, scaleaware=True,
        valid_ranges=[(0, 90), (30, 160), (90, -1)])

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
            rngs={"sampling": jax.random.PRNGKey(3)})
        return sum(jnp.asarray(x) for x in losses.values()), losses

    (total, losses), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(v["params"])
    assert np.isfinite(float(total)), jax.tree.map(float, losses)
    assert "mask_loss" in losses
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
