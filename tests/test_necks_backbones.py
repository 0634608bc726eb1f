"""SE / EfficientNet backbones + NASFPN / PAFPN / FPG necks: shape and
wiring smoke tests with a RetinaNet head on top."""
import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp


def _fake_c_feats(rng, b=1, base=32, ch=16, with_c2=True):
    f = {}
    sizes = {"c2": base, "c3": base // 2, "c4": base // 4, "c5": base // 8}
    for k, s in sizes.items():
        if k == "c2" and not with_c2:
            continue
        f[k] = jnp.asarray(rng.randn(b, s, int(s * 1.5), ch), jnp.float32)
    return f


def test_nasfpn_neck_shapes():
    from simpledet_tpu.models.nasfpn import NASFPNNeck

    rng = np.random.RandomState(0)
    feats = _fake_c_feats(rng)
    neck = NASFPNNeck(filters=32, num_stage=2)
    v = neck.init(jax.random.PRNGKey(0), feats)
    out = jax.jit(lambda p, f: neck.apply(p, f))(v, feats)
    assert set(out) == {"stride8", "stride16", "stride32", "stride64",
                        "stride128"}
    assert out["stride8"].shape == (1, 16, 24, 32)
    assert out["stride128"].shape[1] >= 1


def test_pafpn_and_fpg_neck_shapes():
    from simpledet_tpu.models.fpg import (FPGNeckP3P7, PAFPNNeckP2P6,
                                          PAFPNNeckP3P7)

    rng = np.random.RandomState(1)
    feats = _fake_c_feats(rng)
    for cls, strides in ((PAFPNNeckP2P6, {4, 8, 16, 32, 64}),
                         (PAFPNNeckP3P7, {8, 16, 32, 64, 128}),
                         (FPGNeckP3P7, {8, 16, 32, 64, 128})):
        neck = cls(filters=32, num_stage=2)
        v = neck.init(jax.random.PRNGKey(0), feats)
        out = jax.jit(lambda p, f: neck.apply(p, f))(v, feats)
        assert {int(k.replace("stride", "")) for k in out} == strides, cls


def test_efficientnet_backbone():
    from models.efficientnet.builder import EfficientNetB4FPN

    class P:
        fp16 = False
        normalizer = None

    bb = EfficientNetB4FPN(P)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 96, 3), jnp.float32)
    v = bb.module.init(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda p, a: bb.module.apply(p, a))(v, x)
    assert out["c2"].shape == (1, 16, 24, 32)
    assert out["c3"].shape == (1, 8, 12, 56)
    assert out["c4"].shape == (1, 4, 6, 160)
    assert out["c5"].shape == (1, 2, 3, 1792)


def test_se_backbone_and_mask_head():
    from models.se.builder import SEResNetFPN, MaskRcnnSe4convHead

    class P:
        depth = 50
        fp16 = False
        normalizer = None
        num_c2_block = 0
        num_c3_block = 0
        num_c4_block = 1
        num_c5_block = 1

    bb = SEResNetFPN(P)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
    v = bb.module.init(jax.random.PRNGKey(0), x)
    out = jax.jit(lambda p, a: bb.module.apply(p, a))(v, x)
    assert out["c5"].shape == (1, 2, 2, 2048)
    flat = jax.tree_util.tree_flatten_with_path(v)[0]
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert any("se" in n and "stage4_unit3" in n for n in names)

    class BP:
        num_class = 4
        fp16 = False

    class MP:
        dim_reduced = 32
        fp16 = False

    head = MaskRcnnSe4convHead(BP, MP, None)
    roi = jnp.asarray(rng.randn(1, 4, 7, 7, 16), jnp.float32)
    hv = head.module.init(jax.random.PRNGKey(0), roi)
    logit = head.module.apply(hv, roi)
    assert logit.shape == (1, 4, 14, 14, 4)


def test_retina_with_nasfpn_e2e():
    """RetinaNetHeadWithBN on NASFPN: one train grad + test decode."""
    from models.NASFPN.builder import (MSRAResNet50V1FPN, NASFPNNeck,
                                       RetinaNet, RetinaNetHeadWithBN)
    from mxnext.complicate import normalizer_factory

    class B:
        fp16 = False
        normalizer = None

    class N:
        fp16 = False
        normalizer = normalizer_factory(type="gn")
        dim_reduced = 32
        num_stage = 2
        S0_kernel = 1

    class P:
        num_class = 1 + 3
        fp16 = False
        normalizer = normalizer_factory(type="gn")
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
            pre_nms_top_n = 20
            min_det_score = 0.05

        class focal_loss:
            alpha = 0.25
            gamma = 2.0

    det = RetinaNet()
    model = det.get_train_symbol(MSRAResNet50V1FPN(B), NASFPNNeck(N),
                                 RetinaNetHeadWithBN(P))
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
        return sum(jnp.asarray(x) for x in losses.values())

    total, grads = jax.jit(jax.value_and_grad(loss_fn))(v["params"])
    assert np.isfinite(float(total))
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


def test_fpg_faster_e2e():
    """FPG config group: train losses finite + test contract (the pooled P6
    level deviates from ceil(dim/stride), so anchors must follow the actual
    feature shapes)."""
    import jax
    import jax.numpy as jnp

    from simpledet_tpu.core.config import load_config

    cfg = load_config("config/FPG/faster_r50v1b_fpg6_128_syncbn_1x.py")
    model = cfg.get_config(True)[6].train_symbol
    rng = np.random.RandomState(0)
    data = jnp.asarray(rng.randn(1, 64, 96, 3), jnp.float32)
    im_info = jnp.asarray([[64, 96, 1.0]], jnp.float32)
    gt = np.full((1, 10, 5), -1, np.float32)
    gt[0, 0] = [10, 10, 50, 40, 2]
    v = model.init({"params": jax.random.PRNGKey(0),
                    "sampling": jax.random.PRNGKey(1)},
                   data, im_info, jnp.asarray(gt), mode="train")
    out = model.apply(v, data, im_info, jnp.asarray(gt), mode="train",
                      rngs={"sampling": jax.random.PRNGKey(2)})
    losses = out[0] if isinstance(out, tuple) else out
    for k, x in losses.items():
        if jnp.ndim(x) == 0:
            assert np.isfinite(float(x)), k
    modelT = cfg.get_config(False)[6].test_symbol
    vT = modelT.init({"params": jax.random.PRNGKey(0),
                      "sampling": jax.random.PRNGKey(1)}, data, im_info,
                     mode="test")
    oT = modelT.apply(vT, data, im_info, mode="test")
    assert {"bbox_xyxy", "cls_score", "rois"} <= set(oT)
