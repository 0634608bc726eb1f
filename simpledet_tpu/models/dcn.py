"""Deformable-conv modules + DCN bottleneck (models/dcn/builder.py rewrite).

DeformConv = zero-init offset-predicting conv + gather-based deformable
convolution (ops/deform_conv.py). DCNBottleneck mirrors dcn_resnet_unit
(reference models/dcn/builder.py:8-32): 1x1 -> deformable 3x3 (72-channel
offset conv, 4 deformable groups) -> 1x1, with the projection shortcut.
"""
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from simpledet_tpu.ops.deform_conv import batched_deform_conv2d


class DeformConv(nn.Module):
    """x [B,H,W,C] -> [B,H',W',F]. Offsets predicted by an internal conv
    initialized to zero (the DCN paper's init; makes the layer start as a
    plain conv)."""
    filters: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    num_deformable_group: int = 4
    modulated: bool = False           # v2
    use_bias: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        kk = self.kernel * self.kernel
        g = self.num_deformable_group
        n_off = 2 * g * kk + (g * kk if self.modulated else 0)
        off = nn.Conv(n_off, (self.kernel, self.kernel),
                      strides=(self.stride, self.stride),
                      kernel_dilation=(self.dilation, self.dilation),
                      kernel_init=nn.initializers.zeros,
                      bias_init=nn.initializers.zeros,
                      name="offset_conv")(x.astype(jnp.float32))
        if self.modulated:
            offset, mask = off[..., :2 * g * kk], off[..., 2 * g * kk:]
            mask = jax.nn.sigmoid(mask)
        else:
            offset, mask = off, None
        weight = self.param(
            "kernel", nn.initializers.variance_scaling(
                2.0, "fan_out", "truncated_normal"),
            (self.kernel, self.kernel, x.shape[-1], self.filters),
            jnp.float32)
        bias = (self.param("bias", nn.initializers.zeros,
                           (self.filters,), jnp.float32)
                if self.use_bias else None)
        out = batched_deform_conv2d(
            x.astype(jnp.float32), offset, weight, stride=self.stride,
            dilation=self.dilation, num_deformable_group=g, mask=mask,
            bias=bias)
        return out.astype(self.dtype)


class DCNBottleneck(nn.Module):
    """Bottleneck with a deformable 3x3 (reference dcn_resnet_unit)."""
    filters: int
    stride: int
    norm: Callable
    variant: str = "v1b"
    dtype: Any = jnp.float32
    dilation: int = 1
    modulated: bool = False

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = DeformConv(self.filters, kernel=3, stride=self.stride,
                       dilation=self.dilation, num_deformable_group=4,
                       modulated=self.modulated, dtype=self.dtype,
                       name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = self.norm(name="bn3")(y)
        if residual.shape[-1] != self.filters * 4 or self.stride != 1:
            residual = nn.Conv(self.filters * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="sc_conv")(residual)
            residual = self.norm(name="sc_bn")(residual)
        return nn.relu(y + residual)


class DCNv2Bottleneck(DCNBottleneck):
    """Modulated deformable bottleneck (DCNv2, reference
    models/dcn/builder.py dcn_resnet_unit with modulated=True)."""
    modulated: bool = True


class C4StrideKeyAdapter(nn.Module):
    """Expose a C4/C5 backbone's top feature under the 'stride16' key so the
    single-level detector assembly (models/tridentnet.py TridentFasterRcnn
    _extract / single-stride RPN head) can consume plain ResNet backbones."""
    inner: nn.Module
    key: str = "c4"

    @nn.compact
    def __call__(self, x):
        feats = dict(self.inner(x))
        feats["stride16"] = feats[self.key]
        return feats
