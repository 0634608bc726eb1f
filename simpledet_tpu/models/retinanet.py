"""RetinaNet: P3-P7 neck, shared 4-conv subnets, focal loss, dense decode.

TPU rewrite of the reference models/retinanet/builder.py:
  * RetinaNetNeck (ref :464-594): FPN laterals on c3-c5 with top-down sum and
    3x3 output convs; P6 = 3x3 stride-2 conv on C5 (not P5); P7 = 3x3
    stride-2 conv on relu(P6).
  * RetinaNetHead (ref :41-340): weight-shared (across levels) 4x 3x3 conv
    cls/reg subnets, cls pred bias init -log((1-p)/p) with p=0.01 (ref
    :45-48), focal loss with global-fg-count normalization ('sync_loss' — the
    psum comes free from pjit batch sharding), smooth-L1(sqrt(1/0.11)) reg
    loss divided by fg count (X.bbox_norm).
  * test decode (ref decode_retina.py:34-120 / GenProposalRetina): per-level
    top-k over the (position, anchor, class) score tensor with score
    threshold 0.05 (0 for the coarsest level), then per-class NMS downstream.

Anchor targets run in-graph (targets/retina_target.py) — the reference's
host-side PyramidAnchorTarget2D moved on-device.
"""
import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from simpledet_tpu.models.fpn import xavier_in_uniform
from simpledet_tpu.models.rpn import feature_shape
from simpledet_tpu.ops.anchors import generate_anchor_grid
from simpledet_tpu.ops.bbox import clip_boxes, decode_boxes
from simpledet_tpu.ops.losses import sigmoid_focal_loss, smooth_l1
from simpledet_tpu.ops.nms import NEG_INF
from simpledet_tpu.ops.topk import fast_top_k
from simpledet_tpu.targets.retina_target import batched_retina_anchor_target


class RetinaNetNeck(nn.Module):
    """c2..c5 -> {stride8: P3, ..., stride128: P7} (NHWC)."""
    filters: int = 256
    norm: Any = None
    dtype: Any = jnp.float32
    p6_source: str = "c5"        # RetinaNet: C5; FCOS-style necks: P5

    @nn.compact
    def __call__(self, feats):
        conv = lambda f, k, s, name: nn.Conv(
            f, (k, k), strides=(s, s), use_bias=True,
            kernel_init=xavier_in_uniform, dtype=self.dtype, name=name)

        def maybe_norm(x, name):
            return self.norm(name=name)(x) if self.norm is not None else x

        c3, c4, c5 = feats["c3"], feats["c4"], feats["c5"]
        p5 = maybe_norm(conv(self.filters, 1, 1, "P5_lateral")(c5),
                        "P5_lateral_norm")
        p4_la = maybe_norm(conv(self.filters, 1, 1, "P4_lateral")(c4),
                           "P4_lateral_norm")
        p5_up = jnp.repeat(jnp.repeat(p5, 2, 1), 2, 2)
        p4 = p5_up[:, :p4_la.shape[1], :p4_la.shape[2], :] + p4_la
        p3_la = maybe_norm(conv(self.filters, 1, 1, "P3_lateral")(c3),
                           "P3_lateral_norm")
        p4_up = jnp.repeat(jnp.repeat(p4, 2, 1), 2, 2)
        p3 = p4_up[:, :p3_la.shape[1], :p3_la.shape[2], :] + p3_la

        p3c = maybe_norm(conv(self.filters, 3, 1, "P3_conv")(p3), "P3_norm")
        p4c = maybe_norm(conv(self.filters, 3, 1, "P4_conv")(p4), "P4_norm")
        p5c = maybe_norm(conv(self.filters, 3, 1, "P5_conv")(p5), "P5_norm")
        p6_in = c5 if self.p6_source == "c5" else p5c
        p6 = maybe_norm(conv(self.filters, 3, 2, "P6_conv")(p6_in), "P6_norm")
        p7 = maybe_norm(conv(self.filters, 3, 2, "P7_conv")(nn.relu(p6)),
                        "P7_norm")
        return {"stride8": p3c, "stride16": p4c, "stride32": p5c,
                "stride64": p6, "stride128": p7}


class RetinaSubnets(nn.Module):
    """Weight-shared cls/reg towers applied to every pyramid level.

    Returns {stride: (cls_logit [B,H,W,A*(C-1)], reg_delta [B,H,W,A*4])}.
    """
    num_anchor: int
    num_fg_class: int
    conv_channel: int = 256
    num_conv: int = 4
    prior_prob: float = 0.01
    norm: Any = None                 # per-level norm (NASFPN HeadWithBN)
    shared_norm: bool = False
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pyramid):
        pi = -math.log((1.0 - self.prior_prob) / self.prior_prob)
        convs = {}
        for branch in ("cls", "bbox"):
            for i in range(1, self.num_conv + 1):
                convs[f"{branch}_conv{i}"] = nn.Conv(
                    self.conv_channel, (3, 3),
                    kernel_init=nn.initializers.normal(0.01),
                    dtype=self.dtype, name=f"{branch}_conv{i}")
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
            x = pyramid[key].astype(self.dtype)
            c = x
            for i in range(1, self.num_conv + 1):
                c = convs[f"cls_conv{i}"](c)
                if self.norm is not None:
                    nm = (f"cls_conv{i}_norm" if self.shared_norm
                          else f"cls_conv{i}_{key}_norm")
                    c = self.norm(name=nm)(c)
                c = nn.relu(c)
            r = x
            for i in range(1, self.num_conv + 1):
                r = convs[f"bbox_conv{i}"](r)
                if self.norm is not None:
                    nm = (f"bbox_conv{i}_norm" if self.shared_norm
                          else f"bbox_conv{i}_{key}_norm")
                    r = self.norm(name=nm)(r)
                r = nn.relu(r)
            out[key] = (cls_pred(c.astype(jnp.float32)),
                        bbox_pred(r.astype(jnp.float32)))
        return out


class RetinaNetHead:
    """Stateless helper: target/loss/decode around the subnet module."""

    def __init__(self, p):
        self.p = p
        gen = p.anchor_generate
        self.strides = tuple(gen.stride)
        self.scales = tuple(gen.scale)
        self.ratios = tuple(gen.ratio)
        self.num_anchor = len(self.scales) * len(self.ratios)
        self.num_fg_class = p.num_class - 1
        self.module = RetinaSubnets(
            num_anchor=self.num_anchor, num_fg_class=self.num_fg_class,
            conv_channel=p.head.conv_channel,
            dtype=getattr(p, "dtype", jnp.float32))

    def _level_anchors(self, level_outputs):
        """Anchor grids from the ACTUAL per-level feature shapes (necks with
        pooled extra levels, e.g. NASFPN, may deviate from ceil(dim/stride))."""
        keys = sorted(level_outputs,
                      key=lambda s: int(s.replace("stride", "")))
        out = []
        for key, s in zip(keys, self.strides):
            fh, fw = level_outputs[key][0].shape[1:3]
            out.append(generate_anchor_grid(fh, fw, s, self.scales,
                                            self.ratios))
        return out

    def flatten_outputs(self, level_outputs):
        cls_list, reg_list = [], []
        keys = sorted(level_outputs,
                      key=lambda s: int(s.replace("stride", "")))
        for key in keys:
            cls, reg = level_outputs[key]
            b = cls.shape[0]
            cls_list.append(cls.reshape(b, -1, self.num_fg_class))
            reg_list.append(reg.reshape(b, -1, 4))
        return jnp.concatenate(cls_list, 1), jnp.concatenate(reg_list, 1)

    def loss(self, level_outputs, gt_bbox, im_info, pad_hw):
        p = self.p
        cls_logit, reg_delta = self.flatten_outputs(level_outputs)
        anchors = jnp.asarray(
            np.concatenate(self._level_anchors(level_outputs), 0))
        label, target, weight, fg_count = batched_retina_anchor_target(
            anchors, gt_bbox, im_info[:, :2],
            allowed_border=p.anchor_assign.allowed_border
            if p.anchor_assign and p.anchor_assign.allowed_border is not None
            else 9999,
            neg_thr=(p.anchor_assign and p.anchor_assign.neg_thr) or 0.4,
            pos_thr=(p.anchor_assign and p.anchor_assign.pos_thr) or 0.5,
            min_pos_thr=(p.anchor_assign and p.anchor_assign.min_pos_thr)
            or 0.0)
        label = jax.lax.stop_gradient(label)
        target = jax.lax.stop_gradient(target)
        weight = jax.lax.stop_gradient(weight)

        # global fg-count normalization == reference sync_loss
        # (models/retinanet/builder.py:254-257; under pjit this sum spans the
        # whole sharded batch, i.e. cross-device loss synchronization)
        total_fg = jnp.maximum(jnp.sum(fg_count), 1.0)
        focal = sigmoid_focal_loss(cls_logit, label,
                                   alpha=p.focal_loss.alpha,
                                   gamma=p.focal_loss.gamma)
        cls_loss = jnp.sum(focal) / total_fg

        scalar = 0.11  # reference models/retinanet/builder.py:318
        reg = smooth_l1(reg_delta - target, sigma=math.sqrt(1.0 / scalar))
        reg_loss = jnp.sum(weight * reg) / total_fg

        losses = {"retina_cls_loss": cls_loss, "retina_reg_loss": reg_loss}
        aux = {"rpn_label": label, "rpn_fg_count": total_fg}
        return losses, aux

    def prediction(self, level_outputs, im_info, pad_hw):
        """Per-level thresholded top-k decode.

        Returns (cls_score [B, K, num_class] with bg col 0 zeroed,
        bbox_xyxy [B, K, 4], valid [B, K]); K = per_level_top_n * levels.
        """
        p = self.p
        top_n = p.proposal.pre_nms_top_n
        thresh = p.proposal.min_det_score or 0.05
        mean = (p.head.mean or (0., 0., 0., 0.))
        std = (p.head.std or (1., 1., 1., 1.))
        keys = sorted(level_outputs,
                      key=lambda s: int(s.replace("stride", "")))
        anchors = self._level_anchors(level_outputs)
        max_stride = max(self.strides)

        def per_level(logit, delta, anc, stride, hw):
            """Single image, one level. logit [H,W,A*(C-1)], delta [H,W,A*4]."""
            nfg = self.num_fg_class
            prob = jax.nn.sigmoid(logit.reshape(-1, nfg))     # [N, C-1]
            delta = delta.reshape(-1, 4)
            thr = 0.0 if stride == max_stride else thresh
            flat = prob.reshape(-1)
            k = min(top_n, flat.shape[0])
            masked = jnp.where(flat > thr, flat, NEG_INF)
            top_scores, top_idx = fast_top_k(masked, k)
            a_idx = top_idx // nfg
            cls_idx = top_idx % nfg
            boxes = decode_boxes(anc[a_idx], delta[a_idx],
                                 means=mean, stds=std)
            boxes = clip_boxes(boxes, hw)
            ok = top_scores > NEG_INF / 2
            return boxes, jnp.where(ok, top_scores, 0.0), cls_idx + 1, ok

        all_boxes, all_scores, all_cls, all_ok = [], [], [], []
        for key, anc, stride in zip(keys, anchors, self.strides):
            logit, delta = level_outputs[key]
            anc = jnp.asarray(anc)
            bx, sc, cl, ok = jax.vmap(
                lambda lo, de, hw: per_level(lo, de, anc, stride, hw)
            )(logit, delta, im_info[:, :2])
            all_boxes.append(bx)
            all_scores.append(sc)
            all_cls.append(cl)
            all_ok.append(ok)

        boxes = jnp.concatenate(all_boxes, 1)
        scores = jnp.concatenate(all_scores, 1)
        cls = jnp.concatenate(all_cls, 1)
        ok = jnp.concatenate(all_ok, 1)
        # sparse class-score matrix for the shared per-class NMS postprocess
        num_class = self.p.num_class
        onehot = jax.nn.one_hot(cls, num_class, dtype=scores.dtype)
        cls_score = onehot * scores[..., None] * ok[..., None]
        return cls_score, boxes, ok


class RetinaNet(nn.Module):
    """Single-stage detector assembly (reference RetinaNet.get_train_symbol /
    get_test_symbol, models/retinanet/builder.py:10-38)."""
    backbone: nn.Module
    neck: nn.Module
    head_module: nn.Module
    head: Any

    @nn.compact
    def __call__(self, data, im_info, gt_bbox=None, mode="train"):
        pad_hw = data.shape[1:3]
        feats = self.backbone(data)
        pyr = self.neck(feats)
        outs = self.head_module(pyr)
        if mode == "train":
            losses, aux = self.head.loss(outs, gt_bbox, im_info, pad_hw)
            return losses, aux
        cls_score, bbox_xyxy, valid = self.head.prediction(outs, im_info,
                                                           pad_hw)
        # tile boxes per class for the shared per-class NMS postprocess
        num_class = self.head.p.num_class
        bbox_tiled = jnp.tile(bbox_xyxy, (1, 1, num_class))
        return {"cls_score": cls_score, "bbox_xyxy": bbox_tiled,
                "det_valid": valid}
