"""FPN neck (P2-P6) as a Flax module.

Mirrors the reference FPNNeck (models/FPN/builder.py:400-554): 1x1 laterals
(with bias, xavier-uniform), nearest 2x top-down upsample clipped to the
lateral's spatial dims, 3x3 output convs, and P6 = stride-2 subsampling of
P5_conv (X.max_pool kernel=1 stride=2). Returns {"stride4": P2, ...,
"stride64": P6} in NHWC.
"""
from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

# mx.init.Xavier(factor_type="in", rnd_type="uniform", magnitude=3)
xavier_in_uniform = nn.initializers.variance_scaling(
    1.0, "fan_in", "uniform")


def upsample2x_to(x, target_hw):
    """Nearest 2x upsample then clip to target (reference UpSampling +
    slice_like, models/FPN/builder.py:444-462)."""
    y = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return y[:, :target_hw[0], :target_hw[1], :]


class FPNNeck(nn.Module):
    filters: int = 256
    norm: Callable = None        # optional (NASFPN variants use BN)
    dtype: Any = jnp.float32
    min_stage: int = 2           # P2
    max_stage: int = 6           # P6 via subsample

    @nn.compact
    def __call__(self, feats):
        cs = [feats[f"c{i}"] for i in range(2, 6)]  # c2..c5
        conv = lambda f, k, name: nn.Conv(
            f, (k, k), use_bias=True, kernel_init=xavier_in_uniform,
            dtype=self.dtype, name=name)

        laterals = []
        for i, c in enumerate(cs):
            stage = i + 2
            lat = conv(self.filters, 1, f"P{stage}_lateral")(c)
            if self.norm is not None:
                lat = self.norm(name=f"P{stage}_lateral_norm")(lat)
            laterals.append(lat)

        # top-down pathway
        merged = [None] * 4
        merged[3] = laterals[3]
        for i in (2, 1, 0):
            up = upsample2x_to(merged[i + 1], laterals[i].shape[1:3])
            merged[i] = up + laterals[i]

        out = {}
        p5_conv = None
        for i in range(4):
            stage = i + 2
            y = conv(self.filters, 3, f"P{stage}_conv")(merged[i])
            if self.norm is not None:
                y = self.norm(name=f"P{stage}_conv_norm")(y)
            out[f"stride{2 ** stage}"] = y
            if stage == 5:
                p5_conv = y
        if self.max_stage >= 6:
            out["stride64"] = p5_conv[:, ::2, ::2, :]
        return out


class Neck(nn.Module):
    """Identity neck (symbol/builder.py:822-830) for C4 detectors."""
    @nn.compact
    def __call__(self, feats):
        return feats


class ReduceNeck(nn.Module):
    """Channel-reduce conv neck (symbol/builder.py:833-861). The reference
    reduces only the rcnn feature (get_rcnn_feature) and leaves the rpn
    feature untouched; here the reduced map is published under
    ``rcnn_<key>`` keys, which the RoI extractors prefer, while the RPN
    keeps reading the original ``stride16``/``c5`` keys."""
    filters: int = 256
    norm: Callable = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        key = next(k for k in ("stride16", "c5", "c4") if k in feats)
        y = nn.Conv(self.filters, (3, 3), use_bias=True,
                    kernel_init=nn.initializers.normal(0.01),
                    dtype=self.dtype, name="reduce_conv")(feats[key])
        if self.norm is not None:
            y = self.norm(name="reduce_norm")(y)
        y = nn.relu(y)
        out = dict(feats)
        for k in ("stride16", "c5", "c4"):
            if k in out:
                out[f"rcnn_{k}"] = y
        return out
