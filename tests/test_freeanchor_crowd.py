"""FreeAnchor loss semantics + CrowdHuman double-pred / EMD / set-NMS."""
import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp


def test_set_nms_keeps_same_set():
    from simpledet_tpu.ops.nms import set_nms

    # two nearly identical boxes in the same set + one distinct box
    boxes = jnp.asarray([[0, 0, 10, 10], [0, 0, 10.5, 10.5],
                         [50, 50, 60, 60]], jnp.float32)
    scores = jnp.asarray([0.9, 0.8, 0.7])
    sets = jnp.asarray([5, 5, 7])
    ob, osc, idx, ov = set_nms(boxes, scores, sets, 0.5, 3)
    assert bool(ov[0]) and bool(ov[1]) and bool(ov[2])  # none suppressed
    # different sets -> normal suppression (outputs are compacted kept-first)
    sets2 = jnp.asarray([5, 6, 7])
    _, osc2, _, ov2 = set_nms(boxes, scores, sets2, 0.5, 3)
    assert int(ov2.sum()) == 2
    np.testing.assert_allclose(np.asarray(osc2[:2]), [0.9, 0.7], atol=1e-6)


def test_weighted_nms_votes_boxes():
    from simpledet_tpu.ops.nms import py_weighted_nms

    boxes = jnp.asarray([[0, 0, 10, 10], [1, 1, 11, 11],
                         [50, 50, 60, 60]], jnp.float32)
    scores = jnp.asarray([0.8, 0.8, 0.5])
    vb, vs, _, vv = py_weighted_nms(boxes, scores, 0.5, 0.6, 3)
    # first kept box is the average of the two overlapping ones
    np.testing.assert_allclose(np.asarray(vb[0]), [0.5, 0.5, 10.5, 10.5],
                               atol=1e-4)


def test_emd_loss_picks_best_permutation():
    from simpledet_tpu.models.crowdhuman import emd_loss

    b, r, c = 1, 2, 3
    # prediction 1 fits label A, prediction 2 fits label B
    cls1 = jnp.asarray([[[10., 0, 0], [10., 0, 0]]])
    cls2 = jnp.asarray([[[0, 10., 0], [0, 10., 0]]])
    la = jnp.zeros((1, 2))      # class 0
    lb = jnp.ones((1, 2))       # class 1
    reg = jnp.zeros((1, 2, 8))
    tgt = jnp.zeros((1, 2, 8))
    w = jnp.zeros((1, 2, 8))
    direct = emd_loss(cls1, reg, cls2, reg, la, tgt, w, lb, tgt, w)
    swapped = emd_loss(cls1, reg, cls2, reg, lb, tgt, w, la, tgt, w)
    # permutation-min: both orderings give the same (small) loss
    np.testing.assert_allclose(float(direct), float(swapped), atol=1e-5)
    assert float(direct) < 0.01


def test_double_proposal_target_second_gt():
    from simpledet_tpu.targets.proposal_target import proposal_target_double

    rois = np.zeros((8, 4), np.float32)
    rois[0] = [10, 10, 50, 50]
    gt = np.full((4, 5), -1, np.float32)
    gt[0] = [10, 10, 50, 50, 1]     # best
    gt[1] = [12, 12, 52, 52, 1]     # second, heavy overlap
    out = proposal_target_double(
        jax.random.PRNGKey(0), jnp.asarray(rois), jnp.asarray(gt),
        image_rois=8, fg_fraction=0.5, fg_thr=0.5, bg_thr_hi=0.5,
        bg_thr_lo=0.0, num_reg_class=2, class_agnostic=True,
        bbox_mean=(0, 0, 0, 0), bbox_std=(0.1, 0.1, 0.2, 0.2),
        deterministic=True)
    lbl = np.asarray(out["label"])
    sec = np.asarray(out["sec_label"])
    fg = np.asarray(out["fg_mask"])
    assert (sec[fg] >= 1).any()          # second match found for fg rois
    assert (sec[~fg] == 0).all()
    assert out["sec_bbox_target"].shape == (8, 8)


@pytest.mark.parametrize("refine", [False, True])
def test_crowdhuman_e2e_tiny(refine):
    from models.crowdhuman.builder import (
        DoublePredRcnn, DoublePredFPNBbox2fcHead, FPNNeck, FPNRpnHead,
        FPNRoiAlign, MSRAResNet50V1FPN)

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
            num_reg_class = 2
            class_agnostic = True
            weight = (1.0, 1.0, 1.0, 1.0)
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

    class BboxP:
        fp16 = False
        normalizer = None
        num_class = 2
        image_roi = 16
        batch_image = 1

        class regress_target:
            class_agnostic = True
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

    BboxP.refine_mode = refine
    BboxP.repeat_time = 2

    class RoiP:
        fp16 = False
        normalizer = None
        out_size = 7
        stride = (4, 8, 16, 32)
        roi_canonical_scale = 224
        roi_canonical_level = 4

    det = DoublePredRcnn()
    model = det.get_train_symbol(
        MSRAResNet50V1FPN(B), FPNNeck(B), FPNRpnHead(RpnP),
        FPNRoiAlign(RoiP), DoublePredFPNBbox2fcHead(BboxP))

    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(1, 64, 96, 3), jnp.float32)
    im_info = jnp.asarray([[64, 96, 1.0]], jnp.float32)
    gt = np.full((1, 10, 5), -1, np.float32)
    gt[0, 0] = [10, 10, 50, 40, 1]
    gt[0, 1] = [14, 12, 54, 44, 1]   # crowded pair
    gt = jnp.asarray(gt)

    v = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        data, im_info, gt, mode="train")

    def loss_fn(params):
        losses, _ = model.apply(
            {"params": params}, data, im_info, gt, mode="train",
            rngs={"sampling": jax.random.PRNGKey(5)})
        return sum(jnp.asarray(x) for x in losses.values()), losses

    (total, losses), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True))(v["params"])
    assert np.isfinite(float(total))
    assert "emd_loss" in losses
    assert ("refine_emd_loss" in losses) == refine
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0

    out = jax.jit(lambda p, d, i: model.apply(
        {"params": p}, d, i, mode="test",
        rngs={"sampling": jax.random.PRNGKey(0)}))(v["params"], data, im_info)
    assert out["cls_score"].shape == (1, 64, 2)    # 2x32 double preds
    assert out["set_index"].shape == (1, 64)

    from simpledet_tpu.eval.postprocess import per_class_nms
    boxes, scores, cls, valid = per_class_nms(
        out["cls_score"][0], out["bbox_xyxy"][0], max_det=20,
        nms_type="setnms", set_index=out["set_index"][0])
    assert boxes.shape == (20, 4)


def test_freeanchor_loss_tiny():
    from models.FreeAnchor.builder import (FreeAnchorRetinaNetHead,
                                           RetinaNet, RetinaNetNeck,
                                           MSRAResNet50V1FPN)

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
            ratio = (0.5, 1.0, 2.0)
            stride = (8, 16, 32, 64, 128)

        class anchor_assign:
            bbox_thr = 0.6
            pre_anchor_top_n = 8

        class head:
            conv_channel = 32
            mean = (0., 0., 0., 0.)
            std = (0.1, 0.1, 0.2, 0.2)

        class proposal:
            pre_nms_top_n = 30
            min_det_score = 0.05

        class focal_loss:
            alpha = 0.5
            gamma = 2.0

    det = RetinaNet()
    model = det.get_train_symbol(MSRAResNet50V1FPN(B), RetinaNetNeck(B),
                                 FreeAnchorRetinaNetHead(P))
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
    assert {"freeanchor_positive_loss",
            "freeanchor_negative_loss"} <= set(losses)
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0

    out = jax.jit(lambda p, d, i: model.apply({"params": p}, d, i,
                                              mode="test"))(
        v["params"], data, im_info)
    assert out["cls_score"].shape[2] == 4
