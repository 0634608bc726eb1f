"""Cascade R-CNN: stage refinement semantics + tiny end-to-end step."""
import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp


def test_decode_refined_class_agnostic():
    from simpledet_tpu.models.cascade_rcnn import decode_refined

    proposal = jnp.asarray([[[10., 10., 50., 50.]]])        # [1, 1, 4]
    # zero fg deltas -> refined proposal == input
    delta = jnp.zeros((1, 1, 8))
    im_info = jnp.asarray([[100., 100., 1.0]])
    out = decode_refined(proposal, delta, im_info,
                         mean=(0, 0, 0, 0), std=(0.1, 0.1, 0.2, 0.2))
    np.testing.assert_allclose(np.asarray(out), np.asarray(proposal),
                               atol=1e-4)
    # clipping applies
    delta = jnp.zeros((1, 1, 8)).at[0, 0, 4].set(100.0)   # huge fg dx
    out = np.asarray(decode_refined(proposal, delta, im_info,
                                    mean=(0, 0, 0, 0), std=(1, 1, 1, 1)))
    assert out[0, 0, 0] <= 99.0 and out[0, 0, 2] <= 99.0


def _tiny_cascade(is_train):
    from models.cascade_rcnn.builder import (
        CascadeRcnn, CascadeBbox2fcHead, FPNNeck, FPNRpnHead, FPNRoiAlign,
        MSRAResNet50V1FPN)

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
            fg_fraction = 0.25
            fg_thr = 0.5
            bg_thr_hi = 0.5
            bg_thr_lo = 0.0

        class bbox_target:
            num_reg_class = 2
            class_agnostic = True
            weight = (1.0, 1.0, 1.0, 1.0)
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

    def stage_param(stage, loss_w, reg_std, fg_thr, tgt_std):
        class P:
            fp16 = False
            normalizer = None
            num_class = 4
            image_roi = 16
            batch_image = 1

        P.stage = stage
        P.loss_weight = loss_w
        P.regress_target = type("rt", (), dict(
            class_agnostic=True, mean=(0., 0., 0., 0.), std=reg_std))
        P.subsample_proposal = type("sp", (), dict(
            proposal_wo_gt=False, image_roi=16, fg_fraction=0.25,
            fg_thr=fg_thr, bg_thr_hi=fg_thr, bg_thr_lo=0.0))
        P.bbox_target = type("bt", (), dict(
            num_reg_class=2, class_agnostic=True,
            weight=(1., 1., 1., 1.), mean=(0., 0., 0., 0.), std=tgt_std))
        return P

    p1 = stage_param("1st", 1.0, (0.1, 0.1, 0.2, 0.2), 0.6,
                     (0.05, 0.05, 0.1, 0.1))
    p2 = stage_param("2nd", 0.5, (0.05, 0.05, 0.1, 0.1), 0.7,
                     (0.033, 0.033, 0.067, 0.067))
    p3 = stage_param("3rd", 0.25, (0.033, 0.033, 0.067, 0.067), 0.7,
                     (0.033, 0.033, 0.067, 0.067))

    class RoiP:
        fp16 = False
        normalizer = None
        out_size = 7
        stride = (4, 8, 16, 32)
        roi_canonical_scale = 224
        roi_canonical_level = 4

    det = CascadeRcnn()
    args = (MSRAResNet50V1FPN(B), FPNNeck(B), FPNRpnHead(RpnP),
            FPNRoiAlign(RoiP), CascadeBbox2fcHead(p1),
            CascadeBbox2fcHead(p2), CascadeBbox2fcHead(p3))
    return det.get_train_symbol(*args) if is_train \
        else det.get_test_symbol(*args)


def test_cascade_train_and_test():
    model = _tiny_cascade(is_train=True)
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(1, 64, 96, 3), jnp.float32)
    im_info = jnp.asarray([[64, 96, 1.0]], jnp.float32)
    gt = np.full((1, 10, 5), -1, np.float32)
    gt[0, 0] = [10, 10, 50, 40, 2]
    gt[0, 1] = [40, 20, 80, 60, 1]
    gt = jnp.asarray(gt)

    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        data, im_info, gt, mode="train")

    def loss_fn(params):
        losses, _ = model.apply(
            {"params": params}, data, im_info, gt, mode="train",
            rngs={"sampling": jax.random.PRNGKey(7)})
        return sum(jnp.asarray(v) for v in losses.values()), losses

    (total, losses), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])
    assert np.isfinite(float(total)), jax.tree.map(float, losses)
    for s in ("1st", "2nd", "3rd"):
        assert f"bbox_cls_loss_{s}" in losses
    # three distinct stage heads with their own parameters
    names = set(variables["params"].keys())
    assert {"head_1st", "head_2nd", "head_3rd"} <= names
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0

    out = jax.jit(lambda p, d, i: model.apply(
        {"params": p}, d, i, mode="test",
        rngs={"sampling": jax.random.PRNGKey(0)}))(
        variables["params"], data, im_info)
    assert out["cls_score"].shape == (1, 32, 4)
    assert out["bbox_xyxy"].shape == (1, 32, 16)
    s = np.asarray(out["cls_score"])
    np.testing.assert_allclose(s.sum(-1), 1.0, atol=1e-4)  # averaged softmaxes


def test_cascade_config_loads():
    from simpledet_tpu.core.config import load_config
    cfg = load_config("config/cascade_r50v1_fpn_1x.py")
    out = cfg.get_config(is_train=True)
    assert out[6].train_symbol is not None
