"""NASFPN + PANet-style necks (reference models/NASFPN/builder.py).

merge_gp (:10-20): global-max-pool of the attention feature -> sigmoid ->
scales the major feature -> sum with the attention feature.
NASFPNNeck (:23-140): C3..C7 1x1-reduced to S0_P3..P7, then `num_stage`
NAS-searched merge cells, each producing P3..P7 via the fixed wiring
(P6->P4 gp, sums, pooled downsamples) with relu-conv-BN output nodes.
TopDownBottomUpFPNNeck (:166+): standard FPN top-down plus a bottom-up
(PANet) pathway over P3-P7.
"""
from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

from simpledet_tpu.models.fpn import xavier_in_uniform

xavier_avg_uniform = nn.initializers.variance_scaling(1.0, "fan_avg",
                                                      "uniform")


def _fit_hw(y, ref):
    """Clip and/or edge-pad y's spatial dims to exactly match ref's (odd
    pyramid sizes make integer-ratio resampling land 1 short)."""
    y = y[:, :ref.shape[1], :ref.shape[2], :]
    dy = ref.shape[1] - y.shape[1]
    dx = ref.shape[2] - y.shape[2]
    if dy > 0 or dx > 0:
        y = jnp.pad(y, ((0, 0), (0, max(dy, 0)), (0, max(dx, 0)), (0, 0)),
                    mode="edge")
    return y


def upsample_to(x, ref):
    """Nearest upsample by the integer ratio then fit to ref's spatial dims."""
    ry = -(-ref.shape[1] // max(x.shape[1], 1))
    rx = -(-ref.shape[2] // max(x.shape[2], 1))
    y = jnp.repeat(jnp.repeat(x, max(ry, 1), 1), max(rx, 1), 2)
    return _fit_hw(y, ref)


def pool_to(x, ref):
    """Max-pool downsample by the integer ratio then fit to ref."""
    ry = max(x.shape[1] // max(ref.shape[1], 1), 1)
    rx = max(x.shape[2] // max(ref.shape[2], 1), 1)
    y = nn.max_pool(x, (ry, rx), strides=(ry, rx))
    return _fit_hw(y, ref)


def resize_to(x, ref):
    return upsample_to(x, ref) if x.shape[1] <= ref.shape[1] \
        else pool_to(x, ref)


def safe_pool(x, k):
    """Max-pool by k with the kernel clamped so tiny inputs never collapse
    to zero size (keeps at least a 1x1 map)."""
    ky = min(k, x.shape[1])
    kx = min(k, x.shape[2])
    return nn.max_pool(x, (ky, kx), strides=(ky, kx))


def merge_gp(f1, f2):
    """Global-pooling fusion (reference merge_gp :10-20): sigmoid of f1's
    global max pool gates f2; result summed with f1."""
    att = nn.sigmoid(jnp.max(f1, axis=(1, 2), keepdims=True))
    return f1 + f2 * att


class ReluConvBN(nn.Module):
    filters: int
    norm: Callable = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.relu(x)
        y = nn.Conv(self.filters, (3, 3), use_bias=True,
                    kernel_init=xavier_avg_uniform, dtype=self.dtype,
                    name="conv")(y)
        if self.norm is not None:
            y = self.norm(name="bn")(y)
        return y


class NASFPNNeck(nn.Module):
    """c2..c5 -> {stride8..stride128} after num_stage merge cells."""
    filters: int = 256
    num_stage: int = 7
    s0_kernel: int = 1
    norm: Callable = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        c3, c4, c5 = feats["c3"], feats["c4"], feats["c5"]
        c6 = safe_pool(c5, 2)
        c7 = safe_pool(c5, 4)
        k = self.s0_kernel
        p = {}
        for name, c in zip(("P3", "P4", "P5", "P6", "P7"),
                           (c3, c4, c5, c6, c7)):
            p[name] = nn.Conv(self.filters, (k, k), use_bias=True,
                              kernel_init=xavier_avg_uniform,
                              dtype=self.dtype, name=f"S0_{name}")(c)

        for s in range(1, self.num_stage + 1):
            rcb = lambda name: ReluConvBN(self.filters, norm=self.norm,
                                          dtype=self.dtype,
                                          name=f"S{s}_{name}")
            P3_0, P4_0, P5_0 = p["P3"], p["P4"], p["P5"]
            P6_0, P7_0 = p["P6"], p["P7"]
            # NAS-searched wiring (reference :46-126)
            P4_1 = rcb("P4_1")(merge_gp(upsample_to(P6_0, P4_0), P4_0))
            P4_2 = rcb("P4_2")(P4_0 + P4_1)
            P3_3 = rcb("P3_3")(upsample_to(P4_2, P3_0) + P3_0)
            P4_4 = rcb("P4_4")(P4_2 + pool_to(P3_3, P4_2))
            gp54 = merge_gp(pool_to(P4_4, P5_0), pool_to(P3_3, P5_0))
            P5_5 = rcb("P5_5")(gp54 + P5_0)
            gp75 = merge_gp(pool_to(P5_5, P7_0), pool_to(P4_2, P7_0))
            P7_6 = rcb("P7_6")(gp75 + P7_0)
            P6_7 = rcb("P6_7")(merge_gp(upsample_to(P7_6, P6_0),
                                        pool_to(P5_5, P6_0)))
            p = {"P3": P3_3, "P4": P4_4, "P5": P5_5, "P6": P6_7, "P7": P7_6}

        return {"stride8": p["P3"], "stride16": p["P4"], "stride32": p["P5"],
                "stride64": p["P6"], "stride128": p["P7"]}


class TopDownBottomUpFPNNeck(nn.Module):
    """PANet-style: FPN top-down then a bottom-up pathway, optionally
    stacked num_stage times (reference TopDownBottomUpFPNNeck,
    models/NASFPN/builder.py:166+; the tdbu_640_3@384 config stacks 3)."""
    filters: int = 256
    num_stage: int = 1
    norm: Callable = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feats):
        c3, c4, c5 = feats["c3"], feats["c4"], feats["c5"]
        c6 = safe_pool(c5, 2)
        c7 = safe_pool(c5, 4)
        lat = {}
        for name, c in zip(("P3", "P4", "P5", "P6", "P7"),
                           (c3, c4, c5, c6, c7)):
            lat[name] = nn.Conv(self.filters, (1, 1), use_bias=True,
                                kernel_init=xavier_avg_uniform,
                                dtype=self.dtype,
                                name=f"{name}_lateral")(c)
        cur = lat
        for stage in range(self.num_stage):
            sfx = "" if stage == 0 else f"_s{stage + 1}"
            # top-down
            td = {"P7": cur["P7"]}
            for hi, lo in (("P7", "P6"), ("P6", "P5"), ("P5", "P4"),
                           ("P4", "P3")):
                td[lo] = ReluConvBN(self.filters, norm=self.norm,
                                    dtype=self.dtype,
                                    name=f"td_{lo}{sfx}")(
                    cur[lo] + upsample_to(td[hi], cur[lo]))
            # bottom-up
            bu = {"P3": td["P3"]}
            for lo, hi in (("P3", "P4"), ("P4", "P5"), ("P5", "P6"),
                           ("P6", "P7")):
                bu[hi] = ReluConvBN(self.filters, norm=self.norm,
                                    dtype=self.dtype,
                                    name=f"bu_{hi}{sfx}")(
                    td[hi] + pool_to(bu[lo], td[hi]))
            cur = bu
        return {"stride8": cur["P3"], "stride16": cur["P4"],
                "stride32": cur["P5"], "stride64": cur["P6"],
                "stride128": cur["P7"]}
