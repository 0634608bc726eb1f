"""Squeeze-and-Excitation blocks (reference models/se/builder.py).

se_block mirrors `se` (:17-27 / efficientnet builder se): global avg pool ->
1x1 down -> relu -> 1x1 up -> sigmoid -> channel scale. SEBottleneck is
se_resnet_v1b_unit (:11-64): a v1b bottleneck with SE applied to the conv3
output before the residual add.
"""
from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp


def se_block(x, f_down, name_prefix, *, relu6=False, dtype=jnp.float32):
    """Functional SE used inside @nn.compact bodies via SEModule instead."""
    raise NotImplementedError("use SEModule")


class SEModule(nn.Module):
    f_down: int
    relu6: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        gap = jnp.mean(x, axis=(-3, -2), keepdims=True)
        a = nn.Conv(self.f_down, (1, 1), dtype=self.dtype, name="fc1")(gap)
        a = jnp.minimum(nn.relu(a), 6.0) if self.relu6 else nn.relu(a)
        a = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="fc2")(a)
        return x * nn.sigmoid(a)


class SEBottleneck(nn.Module):
    """v1b bottleneck + SE (reference se_resnet_v1b_unit), ratio 1/16 of the
    output channels."""
    filters: int
    stride: int
    norm: Callable
    variant: str = "v1b"
    dtype: Any = jnp.float32
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        d = self.dilation
        residual = x
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    use_bias=False, kernel_dilation=(d, d),
                    padding=((d, d), (d, d)), dtype=self.dtype,
                    name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = self.norm(name="bn3")(y)
        y = SEModule(f_down=self.filters * 4 // 16, dtype=self.dtype,
                     name="se")(y)
        if residual.shape[-1] != self.filters * 4 or self.stride != 1:
            residual = nn.Conv(self.filters * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="sc_conv")(residual)
            residual = self.norm(name="sc_bn")(residual)
        return nn.relu(y + residual)


class SEMaskHead4Conv(nn.Module):
    """SE-augmented mask head (reference MaskRcnnSe4convHead,
    models/se/builder.py:67-96): 4conv + SE + deconv + 1x1."""
    num_class: int
    dim_reduced: int = 256
    norm: Callable = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feat):
        from simpledet_tpu.models.mask_rcnn import msra_out_normal
        b, f, p, _, c = roi_feat.shape
        x = roi_feat.reshape(b * f, p, p, c).astype(self.dtype)
        for i in range(1, 5):
            x = nn.Conv(self.dim_reduced, (3, 3), kernel_init=msra_out_normal,
                        dtype=self.dtype, name=f"mask_conv{i}")(x)
            if self.norm is not None:
                x = self.norm(name=f"mask_conv{i}_norm")(x)
            x = nn.relu(x)
        x = SEModule(f_down=self.dim_reduced // 16, dtype=self.dtype,
                     name="se")(x)
        x = nn.ConvTranspose(self.dim_reduced, (2, 2), strides=(2, 2),
                             kernel_init=msra_out_normal, dtype=self.dtype,
                             name="mask_up")(x)
        x = nn.relu(x).astype(jnp.float32)
        logit = nn.Conv(self.num_class, (1, 1), kernel_init=msra_out_normal,
                        name="mask_fcn_logit")(x)
        return logit.reshape(b, f, 2 * p, 2 * p, self.num_class)
