"""ResNet backbones (v1 / v1b / v1d / v2) as Flax modules, NHWC, bf16-ready.

Replaces the reference's mxnext.backbone resnet builders (consumed via
symbol/builder.py:643-819). Conventions preserved for checkpoint parity:

  * v1 (MSRA caffe): stride on the FIRST 1x1 conv of a bottleneck; stem is
    7x7/2 conv + BN + relu + 3x3/2 maxpool; block output relu(residual+short).
  * v1b: stride on the 3x3 conv (torchvision); v1d adds deep stem (3x 3x3)
    and avg-pool downsample in the shortcut.
  * v2 (preact): BN+relu before convs; used by TridentNet configs.

Frozen BN (fixbn) keeps stage outputs deterministic; `fixed_param` style
freezing is handled by the optimizer mask (core/train.py), mirroring the
reference's partial-name matching (core/detection_module.py:102-113).
"""
from typing import Any, Callable, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax.ad_checkpoint import checkpoint_name

# depth -> per-stage unit counts (reference mxnext resnet zoo)
RESNET_UNITS = {
    18: (2, 2, 2, 2),
    34: (3, 4, 6, 3),
    50: (3, 4, 6, 3),
    101: (3, 4, 23, 3),
    152: (3, 8, 36, 3),
}


class Bottleneck(nn.Module):
    filters: int           # bottleneck width; output is 4x
    stride: int
    norm: Callable
    variant: str = "v1"    # v1 | v1b | v1d
    dtype: Any = jnp.float32
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        s1 = self.stride if self.variant == "v1" else 1
        s3 = 1 if self.variant == "v1" else self.stride
        d = self.dilation

        residual = x
        y = nn.Conv(self.filters, (1, 1), strides=(s1, s1), use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=(s3, s3), use_bias=False,
                    kernel_dilation=(d, d), padding=((d, d), (d, d)),
                    dtype=self.dtype, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        y = self.norm(name="bn3")(y)

        if residual.shape[-1] != self.filters * 4 or self.stride != 1:
            if self.variant == "v1d" and self.stride != 1:
                residual = nn.avg_pool(residual, (2, 2), strides=(2, 2))
                residual = nn.Conv(self.filters * 4, (1, 1), use_bias=False,
                                   dtype=self.dtype, name="sc_conv")(residual)
            else:
                residual = nn.Conv(self.filters * 4, (1, 1),
                                   strides=(self.stride, self.stride),
                                   use_bias=False, dtype=self.dtype,
                                   name="sc_conv")(residual)
            residual = self.norm(name="sc_bn")(residual)
        return nn.relu(y + residual)


class ResNeXtBottleneck(nn.Module):
    """Grouped-conv bottleneck (mxnext.backbone.resnext): 32x4d convention —
    inner width = filters * 2, 3x3 conv with 32 groups."""
    filters: int
    stride: int
    norm: Callable
    variant: str = "x"
    dtype: Any = jnp.float32
    dilation: int = 1
    groups: int = 32

    @nn.compact
    def __call__(self, x):
        d = self.dilation
        width = self.filters * 2
        residual = x
        y = nn.Conv(width, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(width, (3, 3), strides=(self.stride, self.stride),
                    use_bias=False, kernel_dilation=(d, d),
                    padding=((d, d), (d, d)),
                    feature_group_count=self.groups,
                    dtype=self.dtype, name="conv2")(y)
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


class BottleneckV2(nn.Module):
    """Pre-activation bottleneck (ResNet v2), used by TridentNet backbones."""
    filters: int
    stride: int
    norm: Callable
    dtype: Any = jnp.float32
    dilation: int = 1

    @nn.compact
    def __call__(self, x):
        d = self.dilation
        pre = self.norm(name="bn0")(x)
        pre = nn.relu(pre)
        needs_proj = x.shape[-1] != self.filters * 4 or self.stride != 1
        residual = x
        if needs_proj:
            residual = nn.Conv(self.filters * 4, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="sc_conv")(pre)
        y = nn.Conv(self.filters, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(pre)
        y = self.norm(name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters, (3, 3), strides=(self.stride, self.stride),
                    use_bias=False, kernel_dilation=(d, d),
                    padding=((d, d), (d, d)), dtype=self.dtype, name="conv2")(y)
        y = self.norm(name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.filters * 4, (1, 1), use_bias=False,
                    dtype=self.dtype, name="conv3")(y)
        return y + residual


class ResNet(nn.Module):
    """Returns dict of stage features {"c2": ..., "c3": ..., "c4": ..., "c5": ...}.

    `num_stages` limits computation (C4 backbones stop at c4). For v2, stage
    outputs are post-activation (BN+relu applied at stage exit).
    """
    depth: int = 50
    variant: str = "v1"          # v1 | v1b | v1d | v2
    norm: Callable = None
    dtype: Any = jnp.float32
    num_stages: int = 4          # how many residual stages (2..4 -> c5)
    stage4_dilation: int = 1     # TridentNet / DCN style dilated stage
    # trailing units per stage replaced by a special block (DCN/SE hybrids,
    # reference models/dcn/builder.py hybrid_resnet_stage num_cX_block)
    num_special: Sequence = (0, 0, 0, 0)
    special_block: Callable = None   # module class, Bottleneck-compatible

    @nn.compact
    def __call__(self, x):
        units = RESNET_UNITS[self.depth]
        norm = self.norm
        x = x.astype(self.dtype)

        if self.variant == "v1d":
            for i, f in enumerate((32, 32, 64)):
                x = nn.Conv(f, (3, 3), strides=(2, 2) if i == 0 else (1, 1),
                            use_bias=False, dtype=self.dtype,
                            name=f"conv0_{i}")(x)
                x = norm(name=f"bn0_{i}")(x)
                x = nn.relu(x)
        else:
            x = nn.Conv(64, (7, 7), strides=(2, 2), padding=((3, 3), (3, 3)),
                        use_bias=False, dtype=self.dtype, name="conv0")(x)
            if self.variant != "v2":
                x = norm(name="bn0")(x)
                x = nn.relu(x)
            else:
                # v2 keeps the stem BN too (mxnext resnet_v2 bn0 after conv0)
                x = norm(name="bn0")(x)
                x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        feats = {}
        if self.variant == "v2":
            block_cls = BottleneckV2
        elif self.variant == "x":
            block_cls = ResNeXtBottleneck
        else:
            block_cls = Bottleneck
        filters = (64, 128, 256, 512)
        for stage in range(self.num_stages):
            n_unit = units[stage]
            stride = 1 if stage == 0 else 2
            dilation = 1
            if stage == 3 and self.stage4_dilation != 1:
                stride, dilation = 1, self.stage4_dilation
            n_special = self.num_special[stage] if self.special_block else 0
            for unit in range(n_unit):
                cls = block_cls
                if n_special and unit >= n_unit - n_special:
                    cls = self.special_block
                kw = dict(filters=filters[stage],
                          stride=stride if unit == 0 else 1,
                          norm=norm, dtype=self.dtype, dilation=dilation,
                          name=f"stage{stage + 1}_unit{unit + 1}")
                if self.variant != "v2" and cls is block_cls:
                    kw["variant"] = self.variant
                x = cls(**kw)(x)
            out = x
            if self.variant == "v2":
                out = norm(name=f"stage{stage + 1}_bn")(out)
                out = nn.relu(out)
            # tag stage exits so targeted remat policies (memonger_until,
            # reference utils/memonger_v2.py:171-226) can name them
            out = checkpoint_name(out, f"stage{stage + 1}")
            feats[f"c{stage + 2}"] = out
        return feats
