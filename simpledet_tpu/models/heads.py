"""R-CNN box heads (2fc / conv variants) + losses and predictions.

Mirrors BboxHead & Bbox2fcHead (reference symbol/builder.py:329-513):
flatten roi features -> fc1(1024) -> relu -> fc2(1024) -> relu ->
{cls fc (gauss 0.01), reg fc (gauss 0.001)}; softmax CE ('batch' norm),
smooth-L1 / batch_roi; prediction decodes class-wise boxes with
(mean, std) and clips to im_info (X.decode_bbox,
operator_cxx/contrib/decodebbox-inl.h).
"""
from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from simpledet_tpu.models.fpn import xavier_in_uniform
from simpledet_tpu.ops.bbox import clip_boxes, decode_boxes


class Bbox2fcHead(nn.Module):
    """roi_feat [B, R, P, P, C] -> (cls_logit [B,R,num_class],
    bbox_delta [B,R,4*num_reg_class])."""
    num_class: int
    num_reg_class: int
    norm: Callable = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feat):
        b, r = roi_feat.shape[:2]
        x = roi_feat.reshape(b, r, -1).astype(self.dtype)
        x = nn.Dense(1024, kernel_init=xavier_in_uniform, dtype=self.dtype,
                     name="fc1")(x)
        if self.norm is not None:
            x = self.norm(name="fc1_norm")(x)
        x = nn.relu(x)
        x = nn.Dense(1024, kernel_init=xavier_in_uniform, dtype=self.dtype,
                     name="fc2")(x)
        if self.norm is not None:
            x = self.norm(name="fc2_norm")(x)
        x = nn.relu(x)
        x = x.astype(jnp.float32)
        cls_logit = nn.Dense(self.num_class,
                             kernel_init=nn.initializers.normal(0.01),
                             name="cls_logit")(x)
        bbox_delta = nn.Dense(4 * self.num_reg_class,
                              kernel_init=nn.initializers.normal(0.001),
                              name="bbox_delta")(x)
        return cls_logit, bbox_delta


class Bbox1conv2fcHead(nn.Module):
    """1x 3x3 conv + 2 fc (reference symbol/builder.py:482-513)."""
    num_class: int
    num_reg_class: int
    conv_channel: int = 256
    norm: Callable = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feat):
        b, r, p, _, c = roi_feat.shape
        x = roi_feat.reshape(b * r, p, p, c).astype(self.dtype)
        x = nn.Conv(self.conv_channel, (3, 3),
                    kernel_init=nn.initializers.normal(0.01),
                    dtype=self.dtype, name="conv1")(x)
        if self.norm is not None:
            x = self.norm(name="conv1_norm")(x)
        x = nn.relu(x)
        x = x.reshape(b, r, -1)
        x = nn.Dense(1024, kernel_init=xavier_in_uniform, dtype=self.dtype,
                     name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(1024, kernel_init=xavier_in_uniform, dtype=self.dtype,
                     name="fc2")(x)
        x = nn.relu(x).astype(jnp.float32)
        cls_logit = nn.Dense(self.num_class,
                             kernel_init=nn.initializers.normal(0.01),
                             name="cls_logit")(x)
        bbox_delta = nn.Dense(4 * self.num_reg_class,
                              kernel_init=nn.initializers.normal(0.001),
                              name="bbox_delta")(x)
        return cls_logit, bbox_delta


class Bbox4conv1fcHead(nn.Module):
    """4x 3x3 conv (256) + 1 fc (Bbox4conv1fcHead, symbol/builder.py:516-553)."""
    num_class: int
    num_reg_class: int
    conv_channel: int = 256
    norm: Callable = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feat):
        b, r, p, _, c = roi_feat.shape
        x = roi_feat.reshape(b * r, p, p, c).astype(self.dtype)
        for i in range(4):
            x = nn.Conv(self.conv_channel, (3, 3),
                        kernel_init=nn.initializers.normal(0.01),
                        dtype=self.dtype, name=f"conv{i + 1}")(x)
            if self.norm is not None:
                x = self.norm(name=f"conv{i + 1}_norm")(x)
            x = nn.relu(x)
        x = x.reshape(b, r, -1)
        x = nn.Dense(1024, kernel_init=xavier_in_uniform, dtype=self.dtype,
                     name="fc1")(x)
        x = nn.relu(x).astype(jnp.float32)
        cls_logit = nn.Dense(self.num_class,
                             kernel_init=nn.initializers.normal(0.01),
                             name="cls_logit")(x)
        bbox_delta = nn.Dense(4 * self.num_reg_class,
                              kernel_init=nn.initializers.normal(0.001),
                              name="bbox_delta")(x)
        return cls_logit, bbox_delta


def bbox_head_loss(cls_logit, bbox_delta, label, bbox_target, bbox_weight,
                   smooth_l1_scalar=1.0):
    """cls: softmax CE mean over rois ('batch' normalization);
    reg: smooth-L1 * weight summed / batch_roi (symbol/builder.py:405-446)."""
    b, r = label.shape
    batch_roi = b * r
    logp = jax.nn.log_softmax(cls_logit, axis=-1)
    cls_ll = jnp.take_along_axis(logp, label.astype(jnp.int32)[..., None],
                                 axis=-1)[..., 0]
    cls_loss = -jnp.sum(cls_ll) / batch_roi

    sigma2 = smooth_l1_scalar ** 2
    diff = bbox_delta - bbox_target
    ad = jnp.abs(diff)
    l1 = jnp.where(ad < 1.0 / sigma2, 0.5 * sigma2 * diff * diff,
                   ad - 0.5 / sigma2)
    reg_loss = jnp.sum(bbox_weight * l1) / batch_roi
    return {"bbox_cls_loss": cls_loss, "bbox_reg_loss": reg_loss}


def bbox_head_predict(cls_logit, bbox_delta, rois, im_info, *,
                      bbox_mean, bbox_std, class_agnostic, num_class):
    """Returns (cls_score [B,R,num_class], boxes [B,R,4*num_reg] xyxy clipped)."""
    score = jax.nn.softmax(cls_logit, axis=-1)
    boxes = decode_boxes(rois, bbox_delta, means=bbox_mean, stds=bbox_std)
    boxes = clip_boxes(boxes, im_info[:, None, :2])
    if class_agnostic:
        # broadcast the single fg box to all classes downstream
        boxes = jnp.tile(boxes[..., 4:8], (1, 1, num_class))
    return score, boxes


class BboxDualHeadSmall(nn.Module):
    """Double-Head-style bbox head (reference models/FPN/builder.py:11
    FPNBboxDualHeadSmall): fc branch (2x1024) for classification, conv
    branch (num_block x 3x3/256) for regression."""
    num_class: int
    num_reg_class: int
    num_block: int = 4
    norm: Callable = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feat):
        b, r, p, _, c = roi_feat.shape
        x = roi_feat.astype(self.dtype)
        # classification: flatten -> 2 fc
        cls = x.reshape(b, r, -1)
        for i in (1, 2):
            cls = nn.Dense(1024, kernel_init=xavier_in_uniform,
                           dtype=self.dtype, name=f"cls_fc{i}")(cls)
            if self.norm is not None:
                cls = self.norm(name=f"cls_fc{i}_norm")(cls)
            cls = nn.relu(cls)
        cls = cls.astype(jnp.float32)
        cls_logit = nn.Dense(self.num_class,
                             kernel_init=nn.initializers.normal(0.01),
                             name="cls_logit")(cls)
        # regression: conv tower on the spatial roi feature
        reg = x.reshape(b * r, p, p, c)
        for i in range(self.num_block):
            reg = nn.Conv(256, (3, 3), use_bias=True,
                          kernel_init=nn.initializers.normal(0.01),
                          dtype=self.dtype, name=f"reg_block{i + 1}")(reg)
            if self.norm is not None:
                reg = self.norm(name=f"reg_block{i + 1}_norm")(reg)
            reg = nn.relu(reg)
        reg = reg.reshape(b, r, -1).astype(jnp.float32)
        bbox_delta = nn.Dense(4 * self.num_reg_class,
                              kernel_init=nn.initializers.normal(0.001),
                              name="bbox_delta")(reg)
        return cls_logit, bbox_delta
