"""EfficientNet + SE families: real one-train-step e2e (loss + nonzero
finite grads through the family-specific blocks), promoting both from
shape-tested to train-tested like the other model families.

Reference builders: models/efficientnet/builder.py (B4-B7 + FPN feeding
RetinaNet), models/se/builder.py (SE-ResNet units + SE mask head).
"""
import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp

pytestmark = pytest.mark.slow


def _grad_step(model, data, im_info, gt, rngs=None):
    init_rngs = {"params": jax.random.PRNGKey(0)}
    if rngs:
        init_rngs.update(rngs)
    variables = model.init(init_rngs, data, im_info, gt, mode="train")

    def loss_fn(params):
        kw = {"rngs": rngs} if rngs else {}
        losses, _ = model.apply({"params": params}, data, im_info, gt,
                                mode="train", **kw)
        return sum(jnp.asarray(v) for v in losses.values()), losses

    (total, losses), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])
    return total, losses, grads


def test_efficientnet_retina_train_step():
    from models.efficientnet.builder import EfficientNetB4FPN
    from models.retinanet.builder import (RetinaNet, RetinaNetHead,
                                          RetinaNetNeck)

    class B:
        fp16 = False
        normalizer = None

    class P:
        num_class = 1 + 3
        fp16 = False
        normalizer = None
        batch_image = 1

        class anchor_generate:
            scale = (4,)
            ratio = (1.0,)
            stride = (8, 16, 32, 64, 128)

        class anchor_assign:
            allowed_border = 9999
            pos_thr = 0.5
            neg_thr = 0.4
            min_pos_thr = 0.0

        class head:
            conv_channel = 32
            mean = None
            std = None

        class proposal:
            pre_nms_top_n = 30
            min_det_score = 0.05

        class focal_loss:
            alpha = 0.25
            gamma = 2.0

    model = RetinaNet().get_train_symbol(
        EfficientNetB4FPN(B), RetinaNetNeck(B), RetinaNetHead(P))
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(1, 64, 96, 3), jnp.float32)
    im_info = jnp.asarray([[64, 96, 1.0]], jnp.float32)
    gt = np.full((1, 5, 5), -1, np.float32)
    gt[0, 0] = [10, 10, 50, 40, 2]
    total, losses, grads = _grad_step(model, data, im_info, jnp.asarray(gt))
    assert np.isfinite(float(total)), jax.tree.map(float, losses)
    flat = {"/".join(map(str, k)): v for k, v in
            __import__("flax").traverse_util.flatten_dict(grads).items()}
    # gradient flows through MBConv expand convs AND their SE gates
    mb = [v for k, v in flat.items()
          if "backbone" in k and "se" in k.lower()]
    assert mb, sorted(flat)[:20]
    assert any(float(jnp.sum(jnp.abs(g))) > 0 for g in mb)


def test_se_faster_train_step():
    from models.FPN.builder import (FPNBbox2fcHead, FPNNeck, FPNRoiAlign,
                                    FPNRpnHead)
    from models.se.builder import SEResNetFPN
    from symbol.builder import FasterRcnn as Detector

    class B:
        depth = 50
        fp16 = False
        normalizer = None
        num_c2_block = 0
        num_c3_block = 0
        num_c4_block = 1
        num_c5_block = 1

    class N:
        fp16 = False
        normalizer = None

    class RpnParam:
        fp16 = False
        normalizer = None
        batch_image = 1

        class anchor_generate:
            scale = (8,)
            ratio = (1.0,)
            stride = (4, 8, 16, 32, 64)
            image_anchor = 32
            max_side = 128

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
            pre_nms_top_n = 48
            post_nms_top_n = 24
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
            num_reg_class = 4
            class_agnostic = False
            weight = (1.0, 1.0, 1.0, 1.0)
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

    class RoiParam:
        fp16 = False
        normalizer = None
        out_size = 7
        stride = (4, 8, 16, 32)
        roi_canonical_scale = 224
        roi_canonical_level = 4

    class BboxParam:
        fp16 = False
        normalizer = None
        num_class = 4
        image_roi = 16
        batch_image = 1

        class regress_target:
            class_agnostic = False
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

    model = Detector().get_train_symbol(
        SEResNetFPN(B), FPNNeck(N), FPNRpnHead(RpnParam),
        FPNRoiAlign(RoiParam), FPNBbox2fcHead(BboxParam))
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(1, 64, 96, 3), jnp.float32)
    im_info = jnp.asarray([[64, 96, 1.0]], jnp.float32)
    gt = np.full((1, 5, 5), -1, np.float32)
    gt[0, 0] = [10, 10, 50, 40, 2]
    gt[0, 1] = [30, 20, 60, 55, 1]
    total, losses, grads = _grad_step(
        model, data, im_info, jnp.asarray(gt),
        rngs={"sampling": jax.random.PRNGKey(7)})
    assert np.isfinite(float(total)), jax.tree.map(float, losses)
    flat = {"/".join(map(str, k)): v for k, v in
            __import__("flax").traverse_util.flatten_dict(grads).items()}
    se_grads = [v for k, v in flat.items() if "se" in k.lower()
                and "backbone" in k]
    assert se_grads, sorted(flat)[:20]
    assert any(float(jnp.sum(jnp.abs(g))) > 0 for g in se_grads)


def test_se_mask_head_grads():
    from models.se.builder import MaskRcnnSe4convHead

    class BP:
        num_class = 4
        fp16 = False

    class MP:
        dim_reduced = 16
        fp16 = False

    head = MaskRcnnSe4convHead(BP, MP, None)
    rng = np.random.RandomState(0)
    feat = jnp.asarray(rng.randn(1, 4, 7, 7, 32), jnp.float32)
    v = head.module.init(jax.random.PRNGKey(0), feat)

    def loss_fn(p):
        out = head.module.apply({"params": p["params"]}, feat)
        return jnp.mean(out ** 2)

    g = jax.jit(jax.grad(loss_fn))(v)
    gn = sum(float(jnp.sum(jnp.abs(x))) for x in jax.tree.leaves(g))
    assert np.isfinite(gn) and gn > 0
