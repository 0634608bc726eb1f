"""Golden test for the whole-detector Detectron weight converter
(utils/convert_pretrain.py::convert_detectron_detector; reference
utils/convert_from_detectron.py:1-475).

Reference-free by design: a synthetic Detectron-style state dict covering
every flagship (Faster R-CNN R50-FPN) parameter name is generated, the
converter maps it, and load_pretrain must hit EVERY model parameter
(n_hit == n_params). Semantic conversions (BGR flip, sigmoid->softmax RPN
expansion, CHW->HWC fc6 permutation) are verified numerically.
"""
import os

import numpy as np
import pytest


def detectron_r50_fpn_blobs(rng, with_mask=False, num_class=81):
    """Synthetic Detectron blob dict for Faster/Mask R-CNN R50-FPN."""
    blobs = {}

    def rand(*shape):
        return rng.randn(*shape).astype(np.float32)

    blobs["conv1_w"] = rand(64, 3, 7, 7)
    blobs["res_conv1_bn_s"] = rand(64)
    blobs["res_conv1_bn_b"] = rand(64)
    units = (3, 4, 6, 3)
    widths = (64, 128, 256, 512)
    c_in = 64
    for si, (n, wdt) in enumerate(zip(units, widths)):
        S = si + 2
        for u in range(n):
            blobs[f"res{S}_{u}_branch2a_w"] = rand(wdt, c_in, 1, 1)
            blobs[f"res{S}_{u}_branch2b_w"] = rand(wdt, wdt, 3, 3)
            blobs[f"res{S}_{u}_branch2c_w"] = rand(wdt * 4, wdt, 1, 1)
            for br, c in (("branch2a", wdt), ("branch2b", wdt),
                          ("branch2c", wdt * 4)):
                blobs[f"res{S}_{u}_{br}_bn_s"] = rand(c)
                blobs[f"res{S}_{u}_{br}_bn_b"] = rand(c)
            if u == 0:
                blobs[f"res{S}_0_branch1_w"] = rand(wdt * 4, c_in, 1, 1)
                blobs[f"res{S}_0_branch1_bn_s"] = rand(wdt * 4)
                blobs[f"res{S}_0_branch1_bn_b"] = rand(wdt * 4)
            c_in = wdt * 4
    # FPN: top level has no _lateral suffix in Detectron, lower ones do
    lasts = {2: 2, 3: 3, 4: 5, 5: 2}
    chans = {2: 256, 3: 512, 4: 1024, 5: 2048}
    for S in (2, 3, 4, 5):
        suffix = "" if S == 5 else "_lateral"
        blobs[f"fpn_inner_res{S}_{lasts[S]}_sum{suffix}_w"] = \
            rand(256, chans[S], 1, 1)
        blobs[f"fpn_inner_res{S}_{lasts[S]}_sum{suffix}_b"] = rand(256)
        blobs[f"fpn_res{S}_{lasts[S]}_sum_w"] = rand(256, 256, 3, 3)
        blobs[f"fpn_res{S}_{lasts[S]}_sum_b"] = rand(256)
    # RPN (shared over levels; Detectron stores the fpn2 copy)
    blobs["conv_rpn_fpn2_w"] = rand(256, 256, 3, 3)
    blobs["conv_rpn_fpn2_b"] = rand(256)
    blobs["rpn_cls_logits_fpn2_w"] = rand(3, 256, 1, 1)
    blobs["rpn_cls_logits_fpn2_b"] = rand(3)
    blobs["rpn_bbox_pred_fpn2_w"] = rand(12, 256, 1, 1)
    blobs["rpn_bbox_pred_fpn2_b"] = rand(12)
    # bbox head
    blobs["fc6_w"] = rand(1024, 256 * 7 * 7)
    blobs["fc6_b"] = rand(1024)
    blobs["fc7_w"] = rand(1024, 1024)
    blobs["fc7_b"] = rand(1024)
    blobs["cls_score_w"] = rand(num_class, 1024)
    blobs["cls_score_b"] = rand(num_class)
    blobs["bbox_pred_w"] = rand(num_class * 4, 1024)
    blobs["bbox_pred_b"] = rand(num_class * 4)
    if with_mask:
        for i in range(1, 5):
            blobs[f"_[mask]_fcn{i}_w"] = rand(256, 256, 3, 3)
            blobs[f"_[mask]_fcn{i}_b"] = rand(256)
        blobs["conv5_mask_w"] = rand(256, 256, 2, 2)  # deconv [in,out,kh,kw]
        blobs["conv5_mask_b"] = rand(256)
        blobs["mask_fcn_logits_w"] = rand(num_class, 256, 1, 1)
        blobs["mask_fcn_logits_b"] = rand(num_class)
    return blobs


@pytest.fixture(scope="module")
def flagship_shapes():
    import jax
    import jax.numpy as jnp

    from simpledet_tpu.core.config import load_config
    cfg = load_config("config/faster_r50v1_fpn_1x.py")
    tup = cfg.get_config(is_train=True)
    model = tup[6].train_symbol
    d = jnp.zeros((1, 128, 160, 3))
    ii = jnp.zeros((1, 3))
    gt = jnp.zeros((1, 10, 5))
    vs = jax.eval_shape(lambda: model.init(
        {"params": jax.random.PRNGKey(0),
         "sampling": jax.random.PRNGKey(1)}, d, ii, gt, mode="train"))
    return vs["params"]


def test_flagship_full_coverage(flagship_shapes, tmp_path):
    """Every flagship param is hit by the converted tree: n_hit == n_params
    (the reference converter's contract for whole-model conversion)."""
    import flax

    from simpledet_tpu.core.checkpoint import load_pretrain
    from utils.convert_pretrain import convert_detectron_detector

    blobs = detectron_r50_fpn_blobs(np.random.RandomState(0))
    tree = convert_detectron_detector(blobs, depth=50)

    flat_model = flax.traverse_util.flatten_dict(flagship_shapes)
    flat_conv = flax.traverse_util.flatten_dict(tree)

    missing = [k for k in flat_model if k not in flat_conv]
    assert not missing, f"unconverted params: {sorted(missing)[:10]}"
    bad_shape = [(k, flat_conv[k].shape, flat_model[k].shape)
                 for k in flat_model
                 if flat_conv[k].shape != flat_model[k].shape]
    assert not bad_shape, bad_shape[:10]

    # through the real load_pretrain path (npz flavor)
    npz_path = str(tmp_path / "det")
    np.savez(npz_path + ".npz",
             **{"/".join(k): v for k, v in flat_conv.items()})
    _, n_hit = load_pretrain(flagship_shapes, npz_path)
    assert n_hit == len(flat_model), (n_hit, len(flat_model))


def test_mask_head_conversion_shapes():
    from utils.convert_pretrain import convert_detectron_detector
    blobs = detectron_r50_fpn_blobs(np.random.RandomState(0), with_mask=True)
    tree = convert_detectron_detector(blobs, depth=50)
    mh = tree["mask_head"]
    assert mh["mask_conv1"]["kernel"].shape == (3, 3, 256, 256)
    assert mh["mask_up"]["kernel"].shape == (2, 2, 256, 256)
    assert mh["mask_fcn_logit"]["kernel"].shape == (1, 1, 256, 81)


def test_rpn_sigmoid_to_softmax_equivalence():
    """softmax([0, x])[fg] must equal sigmoid(x) for the expanded kernel."""
    from utils.convert_pretrain import convert_detectron_detector
    rng = np.random.RandomState(1)
    blobs = detectron_r50_fpn_blobs(rng)
    tree = convert_detectron_detector(blobs, depth=50)
    wk = tree["rpn_module"]["rpn_cls"]["kernel"]      # [1,1,256,6]
    bk = tree["rpn_module"]["rpn_cls"]["bias"]        # [6]
    x = rng.randn(256).astype(np.float32)
    det_w = blobs["rpn_cls_logits_fpn2_w"][:, :, 0, 0]  # [3, 256]
    det_logit = det_w @ x + blobs["rpn_cls_logits_fpn2_b"]
    ours = wk[0, 0].T @ x + bk                          # [6]
    pairs = ours.reshape(3, 2)
    p_fg = np.exp(pairs[:, 1]) / np.exp(pairs).sum(-1)
    np.testing.assert_allclose(p_fg, 1 / (1 + np.exp(-det_logit)),
                               rtol=1e-5)


def test_fc6_chw_to_hwc_permutation():
    """Detectron fc6 on a CHW-flattened roi feature == converted fc1 on the
    same feature flattened HWC."""
    from utils.convert_pretrain import convert_detectron_detector
    rng = np.random.RandomState(2)
    blobs = detectron_r50_fpn_blobs(rng)
    tree = convert_detectron_detector(blobs, depth=50)
    feat = rng.randn(256, 7, 7).astype(np.float32)      # CHW
    det_out = blobs["fc6_w"] @ feat.reshape(-1) + blobs["fc6_b"]
    ours_w = tree["bbox_head"]["fc1"]["kernel"]          # [12544, 1024]
    our_out = feat.transpose(1, 2, 0).reshape(-1) @ ours_w \
        + tree["bbox_head"]["fc1"]["bias"]
    np.testing.assert_allclose(our_out, det_out, rtol=1e-3, atol=1e-3)


def test_first_conv_bgr_flip():
    from utils.convert_pretrain import convert_detectron_detector
    rng = np.random.RandomState(3)
    blobs = detectron_r50_fpn_blobs(rng)
    tree = convert_detectron_detector(blobs, depth=50)
    det = blobs["conv1_w"]                               # [64, 3, 7, 7] BGR
    ours = tree["backbone"]["conv0"]["kernel"]           # [7, 7, 3, 64] RGB
    # our R channel (idx 0) must be detectron's R (idx 2)
    np.testing.assert_allclose(ours[:, :, 0, :],
                               det[:, 2].transpose(1, 2, 0), rtol=1e-6)
