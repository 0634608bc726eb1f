"""SEPC: scale-equalizing pyramid convolution on RetinaNet
(reference models/sepc/).

PConvModule (sepc_neck.py:54-109): a 3-tap conv across pyramid levels —
out[L] = conv_mid(x[L]) + conv_down_s2(x[L-1]) + up2(conv_up(x[L+1])) —
with weights SHARED across levels; levels >= start_level optionally use
deformable convs (zero-init offset convs, sepc_dconv.py). iBN
(sepc_neck.py:112+): one BN whose statistics pool over ALL pyramid levels'
positions (here computed functionally; under pjit the batch axis already
spans the global batch = sync iBN). The combined head (SEPCFPN
:40-52): shared cls/loc convs + iBN + relu, channel-concatenated; the
retina subnets then read their half directly (builder.py
RetinaNetHeadWithBNWithSEPC with zero extra convs).
"""
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from simpledet_tpu.models.dcn import DeformConv
from simpledet_tpu.models.retinanet import RetinaNetHead


class IntegratedBN(nn.Module):
    """BN with statistics pooled across a LIST of feature maps (iBN)."""
    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, fms):
        c = fms[0].shape[-1]
        gamma = self.param("gamma", nn.initializers.ones, (c,), jnp.float32)
        beta = self.param("beta", nn.initializers.zeros, (c,), jnp.float32)
        flat = jnp.concatenate([f.reshape(-1, c) for f in fms], axis=0)
        mean = jnp.mean(flat, axis=0)
        var = jnp.mean((flat - mean) ** 2, axis=0)
        scale = gamma / jnp.sqrt(var + self.epsilon)
        bias = beta - mean * scale
        return [f * scale + bias for f in fms]


class SEPCConvShared(nn.Module):
    """One weight set applied to every level; deformable from start_level
    (reference sepc_conv, sepc_dconv.py:20-31)."""
    filters: int
    stride: int = 1
    part_deform: bool = False
    start_level: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, level):
        if self.part_deform and level >= self.start_level:
            return DeformConv(self.filters, kernel=3, stride=self.stride,
                              num_deformable_group=1, use_bias=True,
                              dtype=self.dtype, name="dconv")(x)
        return nn.Conv(self.filters, (3, 3),
                       strides=(self.stride, self.stride),
                       kernel_init=nn.initializers.normal(0.01),
                       dtype=self.dtype, name="conv")(x)


class PConvModule(nn.Module):
    filters: int = 256
    part_deform: bool = False
    start_level: int = 1
    ibn: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, levels):
        conv_up = SEPCConvShared(self.filters, 1, self.part_deform,
                                 self.start_level, self.dtype, name="sepc0")
        conv_mid = SEPCConvShared(self.filters, 1, self.part_deform,
                                  self.start_level, self.dtype, name="sepc1")
        conv_dn = SEPCConvShared(self.filters, 2, self.part_deform,
                                 self.start_level, self.dtype, name="sepc2")
        out = []
        for lv, feat in enumerate(levels):
            y = conv_mid(feat, lv)
            if lv > 0:
                d = conv_dn(levels[lv - 1], lv)
                y = y + d[:, :y.shape[1], :y.shape[2], :]
            if lv < len(levels) - 1:
                u = conv_up(levels[lv + 1], lv)
                u = jnp.repeat(jnp.repeat(u, 2, 1), 2, 2)
                y = y + u[:, :y.shape[1], :y.shape[2], :]
            out.append(y)
        if self.ibn:
            out = IntegratedBN(name="ibn")(out)
        return [nn.relu(y) for y in out]


class SEPCFPN(nn.Module):
    """Stacked PConv modules + combined cls/loc convs; per-level output is
    channel-concat [relu(cls), relu(loc)] (2*filters)."""
    filters: int = 256
    pconv_num: int = 4
    pconv_deform: bool = False
    lcconv_deform: bool = False
    ibn: bool = False
    start_level: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pyramid):
        keys = sorted((k for k in pyramid if k.startswith("stride")),
                      key=lambda s: int(s.replace("stride", "")))
        levels = [pyramid[k] for k in keys]
        for i in range(self.pconv_num):
            levels = PConvModule(self.filters, self.pconv_deform,
                                 self.start_level, self.ibn, self.dtype,
                                 name=f"PConv{i}")(levels)
        cconv = SEPCConvShared(self.filters, 1, self.lcconv_deform,
                               self.start_level, self.dtype, name="CConv")
        lconv = SEPCConvShared(self.filters, 1, self.lcconv_deform,
                               self.start_level, self.dtype, name="LConv")
        cls_outs = [cconv(f, lv) for lv, f in enumerate(levels)]
        loc_outs = [lconv(f, lv) for lv, f in enumerate(levels)]
        if self.ibn:
            cls_outs = IntegratedBN(name="cconv_ibn")(cls_outs)
            loc_outs = IntegratedBN(name="lconv_ibn")(loc_outs)
        combined = [jnp.concatenate([nn.relu(c), nn.relu(l)], axis=-1)
                    for c, l in zip(cls_outs, loc_outs)]
        return {k: f for k, f in zip(keys, combined)}


class SEPCSubnets(nn.Module):
    """Retina outputs reading the combined SEPC halves directly
    (reference RetinaNetHeadWithBNWithSEPC: zero extra convs)."""
    num_anchor: int
    num_fg_class: int
    prior_prob: float = 0.01
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pyramid):
        import math
        pi = -math.log((1.0 - self.prior_prob) / self.prior_prob)
        cls_pred = nn.Conv(self.num_anchor * self.num_fg_class, (3, 3),
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(pi),
                           name="cls_pred")
        bbox_pred = nn.Conv(self.num_anchor * 4, (3, 3),
                            kernel_init=nn.initializers.normal(0.01),
                            name="bbox_pred")
        out = {}
        keys = sorted(pyramid, key=lambda s: int(s.replace("stride", "")))
        for key in keys:
            x = pyramid[key].astype(jnp.float32)
            c = x.shape[-1] // 2
            out[key] = (cls_pred(x[..., :c]), bbox_pred(x[..., c:]))
        return out


class SEPCRetinaNetHead(RetinaNetHead):
    """RetinaNetHead whose subnets are the SEPC combined-feature readers."""

    def __init__(self, p):
        super().__init__(p)
        self.module = SEPCSubnets(num_anchor=self.num_anchor,
                                  num_fg_class=self.num_fg_class,
                                  dtype=getattr(p, "dtype", jnp.float32))
