"""Feature Pyramid Grids + PAFPN necks (reference models/FPG/builder.py).

PAFPNNeck (:161-310): per stage, a top-down pass (sum + relu-conv-BN) then
an implicit bottom-up continuation; P2-P6 and P3-P7 variants.
FPGNeck (:5-160): a grid of `num_stage` pyramid columns connected by the
paper's pathway types — same-up (pool from the level below, same stage),
across-same (skip from previous stage, same level), across-down (upsampled
from the level above, previous stage), across-up (pooled from the level
below, previous stage) — each a conv(+BN), summed then relu'd.
"""
from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

from simpledet_tpu.models.nasfpn import (ReluConvBN, pool_to, safe_pool,
                                         upsample_to, xavier_avg_uniform)

LEVELS_P2P6 = ("P2", "P3", "P4", "P5", "P6")
LEVELS_P3P7 = ("P3", "P4", "P5", "P6", "P7")


class _NeckBase(nn.Module):
    filters: int = 256
    num_stage: int = 2
    norm: Callable = None
    dtype: Any = jnp.float32
    levels: tuple = LEVELS_P2P6

    def _laterals(self, feats):
        """1x1-reduce C features; extra coarse levels from max-pooled c5."""
        cs = {"P2": feats.get("c2"), "P3": feats["c3"], "P4": feats["c4"],
              "P5": feats["c5"]}
        c5 = feats["c5"]
        cs["P6"] = safe_pool(c5, 2)
        cs["P7"] = safe_pool(c5, 4)
        out = {}
        for name in self.levels:
            out[name] = nn.Conv(self.filters, (1, 1), use_bias=True,
                                kernel_init=xavier_avg_uniform,
                                dtype=self.dtype, name=f"S0_{name}")(cs[name])
        return out

    def _strides(self, p):
        stride_of = {"P2": 4, "P3": 8, "P4": 16, "P5": 32, "P6": 64,
                     "P7": 128}
        return {f"stride{stride_of[k]}": v for k, v in p.items()}


class PAFPNNeck(_NeckBase):
    """Per stage: top-down sums then bottom-up sums, each node relu-conv-BN
    (reference PAFPNNeck.get_fused_P_feature :183-268)."""

    @nn.compact
    def __call__(self, feats):
        p = self._laterals(feats)
        lv = list(self.levels)
        for s in range(1, self.num_stage + 1):
            rcb = lambda name: ReluConvBN(self.filters, norm=self.norm,
                                          dtype=self.dtype,
                                          name=f"S{s}_{name}")
            td = {lv[-1]: p[lv[-1]]}
            for i in range(len(lv) - 2, -1, -1):
                cur, above = lv[i], lv[i + 1]
                td[cur] = rcb(f"{cur}_td")(
                    p[cur] + upsample_to(td[above], p[cur]))
            bu = {lv[0]: td[lv[0]]}
            for i in range(1, len(lv)):
                cur, below = lv[i], lv[i - 1]
                bu[cur] = rcb(f"{cur}_bu")(
                    td[cur] + pool_to(bu[below], td[cur]))
            p = bu
        return self._strides(p)


class PAFPNNeckP2P6(PAFPNNeck):
    pass


class PAFPNNeckP3P7(PAFPNNeck):
    levels: tuple = LEVELS_P3P7


class FPGNeck(_NeckBase):
    """Feature Pyramid Grids: each grid node sums its pathway inputs
    (across-same skip, across-down, across-up, same-up), conv+BN per
    pathway, relu at the node (reference FPGNeck :27-115)."""
    num_stage: int = 5

    @nn.compact
    def __call__(self, feats):
        p = self._laterals(feats)
        lv = list(self.levels)

        def path_conv(x, name, stage):
            y = nn.Conv(self.filters, (3, 3), use_bias=True,
                        kernel_init=xavier_avg_uniform, dtype=self.dtype,
                        name=f"S{stage}_{name}_conv")(x)
            if self.norm is not None:
                y = self.norm(name=f"S{stage}_{name}_bn")(y)
            return y

        for s in range(1, self.num_stage + 1):
            new_p = {}
            for i, cur in enumerate(lv):
                terms = [path_conv(p[cur], f"{cur}_across_same", s)]
                if i + 1 < len(lv):
                    above = lv[i + 1]
                    terms.append(path_conv(
                        upsample_to(p[above], p[cur]),
                        f"{cur}_across_down", s))
                if i > 0:
                    below = lv[i - 1]
                    terms.append(path_conv(
                        pool_to(p[below], p[cur]), f"{cur}_across_up", s))
                    if below in new_p:
                        terms.append(path_conv(
                            pool_to(new_p[below], p[cur]),
                            f"{cur}_same_up", s))
                new_p[cur] = nn.relu(sum(terms))
            p = new_p
        return self._strides(p)


class FPGNeckP2P6(FPGNeck):
    pass


class FPGNeckP3P7(FPGNeck):
    levels: tuple = LEVELS_P3P7
