"""SEPC: pyramid conv wiring, iBN pooling, e2e retina-with-SEPC step."""
import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp


def test_integrated_bn_pools_all_levels():
    from simpledet_tpu.models.sepc import IntegratedBN

    rng = np.random.RandomState(0)
    fms = [jnp.asarray(rng.randn(1, 8, 8, 4) * 3 + 1, jnp.float32),
           jnp.asarray(rng.randn(1, 4, 4, 4) * 3 + 1, jnp.float32)]
    m = IntegratedBN()
    v = m.init(jax.random.PRNGKey(0), fms)
    out = m.apply(v, fms)
    flat = np.concatenate([np.asarray(o).reshape(-1, 4) for o in out])
    # pooled stats -> overall mean ~0, var ~1
    np.testing.assert_allclose(flat.mean(0), 0.0, atol=1e-4)
    np.testing.assert_allclose(flat.var(0), 1.0, atol=1e-3)


def test_pconv_shares_weights_across_levels():
    from simpledet_tpu.models.sepc import PConvModule

    rng = np.random.RandomState(0)
    levels = [jnp.asarray(rng.randn(1, 8, 12, 16), jnp.float32),
              jnp.asarray(rng.randn(1, 4, 6, 16), jnp.float32),
              jnp.asarray(rng.randn(1, 2, 3, 16), jnp.float32)]
    m = PConvModule(filters=16)
    v = m.init(jax.random.PRNGKey(0), levels)
    # one weight set for all levels
    assert set(v["params"].keys()) == {"sepc0", "sepc1", "sepc2"}
    out = m.apply(v, levels)
    assert [o.shape for o in out] == [l.shape for l in levels]


def test_sepc_retina_e2e():
    from models.sepc.builder import (RetinaNet, RetinaNetNeckWithBNWithSEPC,
                                     RetinaNetHeadWithBNWithSEPC,
                                     MSRAResNet50V1FPN)

    class B:
        fp16 = False
        normalizer = None

    class N:
        fp16 = False
        normalizer = None

    class S:
        Pconv_num = 2
        pconv_deform = False
        lcconv_deform = False
        ibn = True

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

    det = RetinaNet()
    model = det.get_train_symbol(
        MSRAResNet50V1FPN(B), RetinaNetNeckWithBNWithSEPC(N, S),
        RetinaNetHeadWithBNWithSEPC(P))
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
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0
