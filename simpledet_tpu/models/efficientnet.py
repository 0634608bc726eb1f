"""EfficientNet B4-B7 backbones (reference models/efficientnet/builder.py).

MBConv: optional 1x1 expand (ratio 1 or 6) -> depthwise kxk -> SE
(f_down = f_in // 4) -> 1x1 project; residual when not projecting. relu6
activations, stage layout per efficientnet_b4..b7 (:85-125); FPN consumes
stages (3, 4, 6, 9) = strides (4, 8, 16, 32) (:126-137).
"""
from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

from simpledet_tpu.models.se import SEModule

# variant -> (units, f_out, strides, kernels, block kinds)
EFFNET_CONFIG = {
    "b4": ([1, 2, 4, 4, 6, 6, 8, 2, 1],
           [48, 24, 32, 56, 112, 160, 272, 448, 1792],
           [2, 1, 2, 2, 2, 1, 2, 1, 1],
           [3, 3, 3, 5, 3, 5, 5, 3, 1],
           ["conv", 1, 6, 6, 6, 6, 6, 6, "conv"]),
    "b5": ([1, 3, 5, 5, 7, 7, 9, 3, 1],
           [48, 24, 40, 64, 128, 172, 304, 512, 2048],
           [2, 1, 2, 2, 2, 1, 2, 1, 1],
           [3, 3, 3, 5, 3, 5, 5, 3, 1],
           ["conv", 1, 6, 6, 6, 6, 6, 6, "conv"]),
    "b6": ([1, 3, 6, 6, 8, 8, 11, 3, 1],
           [56, 32, 40, 72, 144, 200, 344, 576, 2304],
           [2, 1, 2, 2, 2, 1, 2, 1, 1],
           [3, 3, 3, 5, 3, 5, 5, 3, 1],
           ["conv", 1, 6, 6, 6, 6, 6, 6, "conv"]),
    "b7": ([1, 4, 7, 7, 10, 10, 13, 4, 1],
           [64, 32, 48, 80, 160, 224, 384, 640, 2560],
           [2, 1, 2, 2, 2, 1, 2, 1, 1],
           [3, 3, 3, 5, 3, 5, 5, 3, 1],
           ["conv", 1, 6, 6, 6, 6, 6, 6, "conv"]),
}


def relu6(x):
    return jnp.minimum(nn.relu(x), 6.0)


class MBConv(nn.Module):
    f_in: int
    f_out: int
    kernel: int
    stride: int
    ratio: int
    proj: bool
    norm: Callable = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = x
        if self.ratio != 1:
            y = nn.Conv(self.f_in * self.ratio, (1, 1), use_bias=True,
                        dtype=self.dtype, name="conv1")(y)
            y = self.norm(name="bn1")(y)
            y = relu6(y)
        k = self.kernel
        y = nn.Conv(self.f_in * self.ratio, (k, k),
                    strides=(self.stride, self.stride),
                    feature_group_count=self.f_in * self.ratio,
                    use_bias=True, dtype=self.dtype, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = relu6(y)
        y = SEModule(f_down=self.f_in // 4, relu6=True, dtype=self.dtype,
                     name="se2")(y)
        y = nn.Conv(self.f_out, (1, 1), use_bias=True, dtype=self.dtype,
                    name="conv3")(y)
        y = self.norm(name="bn3")(y)
        return y if self.proj else y + x


class EfficientNet(nn.Module):
    """Returns {"c2", "c3", "c4", "c5"} at strides (4, 8, 16, 32)."""
    variant: str = "b4"
    norm: Callable = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        us, fos, ss, ks, cs = EFFNET_CONFIG[self.variant]
        fis = [0] + fos[:-1]
        x = x.astype(self.dtype)
        stages = []
        for i, (u, fo, fi, s, k, kind) in enumerate(
                zip(us, fos, fis, ss, ks, cs), start=1):
            for j in range(1, u + 1):
                stride = s if j == 1 else 1
                proj = j == 1
                f_in = fi if j == 1 else fo
                name = f"stage{i}_unit{j}"
                if kind == "conv":
                    x = nn.Conv(fo, (k, k), strides=(stride, stride),
                                use_bias=True, dtype=self.dtype,
                                name=f"{name}_conv1")(x)
                    x = self.norm(name=f"{name}_bn1")(x)
                    x = relu6(x)
                else:
                    x = MBConv(f_in=f_in, f_out=fo, kernel=k, stride=stride,
                               ratio=int(kind), proj=proj, norm=self.norm,
                               dtype=self.dtype, name=name)(x)
            stages.append(x)
        # stages[2], [3], [5], [8] -> strides 4, 8, 16, 32
        return {"c2": stages[2], "c3": stages[3], "c4": stages[5],
                "c5": stages[8]}
