"""Deformable conv: zero-offset equivalence with plain conv, v2 modulation,
DCN backbone smoke."""
import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp


def test_zero_offset_equals_plain_conv():
    from simpledet_tpu.ops.deform_conv import deform_conv2d

    rng = np.random.RandomState(0)
    h, w, c, f = 9, 11, 4, 6
    x = jnp.asarray(rng.randn(h, w, c), jnp.float32)
    weight = jnp.asarray(rng.randn(3, 3, c, f), jnp.float32)
    offset = jnp.zeros((h, w, 2 * 9))

    got = deform_conv2d(x, offset, weight, stride=1, num_deformable_group=1)

    ref = jax.lax.conv_general_dilated(
        x[None], weight, window_strides=(1, 1), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_zero_offset_stride2_groups():
    from simpledet_tpu.ops.deform_conv import deform_conv2d

    rng = np.random.RandomState(1)
    h, w, c, f = 12, 16, 8, 4
    x = jnp.asarray(rng.randn(h, w, c), jnp.float32)
    weight = jnp.asarray(rng.randn(3, 3, c, f), jnp.float32)
    oh, ow = h // 2, w // 2
    offset = jnp.zeros((oh, ow, 2 * 4 * 9))

    got = deform_conv2d(x, offset, weight, stride=2, num_deformable_group=4)
    ref = jax.lax.conv_general_dilated(
        x[None], weight, window_strides=(2, 2), padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"))[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_integer_offset_shifts_sampling():
    from simpledet_tpu.ops.deform_conv import deform_conv2d

    rng = np.random.RandomState(2)
    h, w, c = 8, 8, 2
    x = np.zeros((h, w, c), np.float32)
    x[3, 4] = 1.0
    # 1x1 deformable conv with identity weight: output = sampled input
    weight = np.eye(c, dtype=np.float32).reshape(1, 1, c, c)
    # offset (+1, +2): sample at (y+1, x+2)
    offset = np.zeros((h, w, 2), np.float32)
    offset[..., 0] = 1.0
    offset[..., 1] = 2.0
    got = np.asarray(deform_conv2d(
        jnp.asarray(x), jnp.asarray(offset), jnp.asarray(weight),
        stride=1, padding=0, num_deformable_group=1))
    # output at (2, 2) samples input (3, 4)
    assert got[2, 2, 0] == pytest.approx(1.0)
    assert got[3, 4, 0] == pytest.approx(0.0)


def test_modulated_v2_mask():
    from simpledet_tpu.ops.deform_conv import deform_conv2d

    rng = np.random.RandomState(3)
    x = jnp.asarray(rng.randn(6, 6, 2), jnp.float32)
    weight = jnp.asarray(rng.randn(3, 3, 2, 3), jnp.float32)
    offset = jnp.zeros((6, 6, 18))
    half = jnp.full((6, 6, 9), 0.5)
    full_out = deform_conv2d(x, offset, weight, num_deformable_group=1)
    half_out = deform_conv2d(x, offset, weight, num_deformable_group=1,
                             mask=half)
    np.testing.assert_allclose(np.asarray(half_out), 0.5 * np.asarray(full_out),
                               rtol=1e-4, atol=1e-5)


def test_dcn_backbone_smoke():
    from models.dcn.builder import DCNResNetFPN

    class P:
        depth = 50
        fp16 = False
        normalizer = None
        num_c2_block = 0
        num_c3_block = 0
        num_c4_block = 1
        num_c5_block = 1

    bb = DCNResNetFPN(P)
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(1, 64, 64, 3), jnp.float32)
    variables = bb.module.init(jax.random.PRNGKey(0), x)
    feats = jax.jit(lambda p, a: bb.module.apply(p, a))(variables, x)
    assert feats["c5"].shape == (1, 2, 2, 2048)
    # DCN units exist with offset convs
    flat = jax.tree_util.tree_flatten_with_path(variables)[0]
    names = {"/".join(str(k) for k in path) for path, _ in flat}
    assert any("offset_conv" in n and "stage4_unit3" in n for n in names)
    assert any("offset_conv" in n and "stage3_unit6" in n for n in names)
