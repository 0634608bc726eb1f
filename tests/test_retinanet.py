"""RetinaNet family: focal loss vs numpy oracle, dense anchor target
semantics (reference models/retinanet/input.py:33-106), and a tiny
end-to-end train/test step."""
import numpy as np
import pytest

import tests.conftest  # noqa: F401  (force CPU before jax import)
import jax
import jax.numpy as jnp


def test_focal_loss_matches_numpy_oracle():
    from simpledet_tpu.ops.losses import sigmoid_focal_loss

    rng = np.random.RandomState(0)
    n, c = 50, 4
    logits = rng.randn(n, c).astype(np.float32) * 2
    label = rng.randint(-1, c + 1, n).astype(np.float32)

    alpha, gamma = 0.25, 2.0
    p = 1.0 / (1.0 + np.exp(-logits))
    expect = np.zeros(n)
    for i in range(n):
        if label[i] < 0:
            continue
        for k in range(c):
            if int(label[i]) - 1 == k:
                expect[i] += -alpha * (1 - p[i, k]) ** gamma * np.log(p[i, k])
            else:
                expect[i] += -(1 - alpha) * p[i, k] ** gamma * np.log(1 - p[i, k])

    got = np.asarray(sigmoid_focal_loss(jnp.asarray(logits),
                                        jnp.asarray(label),
                                        alpha=alpha, gamma=gamma))
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-6)


def test_retina_anchor_target_semantics():
    from simpledet_tpu.ops.anchors import generate_anchor_grid
    from simpledet_tpu.targets.retina_target import retina_anchor_target

    anchors = generate_anchor_grid(8, 8, 8, (4,), (1.0,))  # [64, 4]
    gt = np.full((5, 5), -1, np.float32)
    gt[0] = [8, 8, 40, 40, 3]    # aligns well with some anchors
    gt[1] = [30, 30, 62, 62, 7]
    label, target, weight, fg_count = jax.jit(
        lambda a, g, hw: retina_anchor_target(a, g, hw)
    )(jnp.asarray(anchors), jnp.asarray(gt), jnp.asarray([64., 64.]))
    label = np.asarray(label)

    # positives carry the CLASS id, not 1
    fg = label >= 1
    assert fg.any()
    assert set(np.unique(label[fg])) <= {3.0, 7.0}
    # every gt's best anchor is positive
    assert float(fg_count) == fg.sum()
    # reg weight only on positives
    w = np.asarray(weight)
    assert (w[fg] == 1).all() and (w[~fg] == 0).all()
    # no gt -> all background (no ignore except border)
    label0, _, _, fgc0 = retina_anchor_target(
        jnp.asarray(anchors), jnp.full((5, 5), -1.0), jnp.asarray([64., 64.]))
    assert (np.asarray(label0) == 0).all()
    assert float(fgc0) == 1  # clamped


@pytest.fixture(scope="module")
def retina_cfg():
    from simpledet_tpu.core.config import load_config
    cfg = load_config("config/retina_r50v1_fpn_1x.py")
    return cfg


def _tiny_retina(is_train):
    """Small RetinaNet: 4 classes, r50 backbone, 64x96 input."""
    from models.retinanet.builder import (RetinaNet, RetinaNetHead,
                                          RetinaNetNeck, MSRAResNet50V1FPN)

    class P:
        num_class = 1 + 3
        fp16 = False
        normalizer = None
        batch_image = 1

        class anchor_generate:
            scale = (4,)
            ratio = (0.5, 1.0, 2.0)
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
            pre_nms_top_n = 50
            min_det_score = 0.05

        class focal_loss:
            alpha = 0.25
            gamma = 2.0

    class B:
        fp16 = False
        normalizer = None

    det = RetinaNet()
    bb = MSRAResNet50V1FPN(B)
    neck = RetinaNetNeck(B)
    head = RetinaNetHead(P)
    if is_train:
        return det.get_train_symbol(bb, neck, head)
    return det.get_test_symbol(bb, neck, head)


def test_retinanet_train_and_test_step():
    model = _tiny_retina(is_train=True)
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(1, 64, 96, 3), jnp.float32)
    im_info = jnp.asarray([[64, 96, 1.0]], jnp.float32)
    gt = np.full((1, 10, 5), -1, np.float32)
    gt[0, 0] = [10, 10, 50, 40, 2]
    gt = jnp.asarray(gt)

    variables = model.init({"params": jax.random.PRNGKey(0)},
                           data, im_info, gt, mode="train")

    def loss_fn(params):
        losses, _ = model.apply({"params": params}, data, im_info, gt,
                                mode="train")
        return sum(jnp.asarray(v) for v in losses.values()), losses

    (total, losses), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(variables["params"])
    assert np.isfinite(float(total)), losses
    assert "retina_cls_loss" in losses and "retina_reg_loss" in losses
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0

    # test graph: decode shapes + per-class NMS compatibility
    out = jax.jit(lambda p, d, i: model.apply({"params": p}, d, i,
                                              mode="test"))(
        variables["params"], data, im_info)
    k = out["cls_score"].shape[1]
    assert out["cls_score"].shape == (1, k, 4)
    assert out["bbox_xyxy"].shape == (1, k, 16)

    from simpledet_tpu.eval.postprocess import per_class_nms
    boxes, scores, cls, valid = per_class_nms(
        out["cls_score"][0], out["bbox_xyxy"][0], max_det=20)
    assert boxes.shape == (20, 4)


def test_retina_config_loads(retina_cfg):
    out = retina_cfg.get_config(is_train=True)
    assert len(out) == 13
    model = out[6].train_symbol
    assert model is not None
