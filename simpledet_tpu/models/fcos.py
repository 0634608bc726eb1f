"""FCOS: anchor-free dense detection with in-graph target generation.

TPU rewrite of the reference models/FCOS/:
  * targets (input.py:14-263 make_fcos_gt): per-location (l,t,r,b) offsets to
    each gt, in-box test, FPN stage assignment by max-offset range
    ((-inf,64),(64,128),(128,256),(256,512),(512,inf)), smallest-area gt wins
    per location, centerness = sqrt(min(l,r)/max(l,r) * min(t,b)/max(t,b)),
    padding area ignored. All computed on device here (the reference used
    CustomOp CPU kernels).
  * head (builder.py:13-180 FCOSFPNHead): weight-shared 4-conv cls tower
    (per-level GroupNorm affine) feeding 3x3 centerness(1) + cls(C-1, bias
    -log(99)) convs; separate 4-conv offset tower + 3x3 offset(4) conv,
    per-level learnable scalar then exp.
  * losses (loss.py): sigmoid focal / (num_pos + 1), centerness BCE over
    positive locations, IoU loss -log((I+1)/(U+1)) weighted by gt centerness
    and normalized by its sum.
  * test decode (utils.py:7-70 GetProposalSingleStage): per-level top-k over
    cls*centerness with cls-prob threshold, offsets decoded at location
    centers, clipped to the image.
"""
import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from simpledet_tpu.models.rpn import feature_shape
from simpledet_tpu.ops.nms import NEG_INF
from simpledet_tpu.ops.topk import fast_top_k

STAGE_BOUNDS = ((-1e5, 64.), (64., 128.), (128., 256.), (256., 512.),
                (512., 1e10))


def fcos_locations(pad_hw, strides):
    """Per-level location centers. Returns (xy [HW_total, 2],
    bounds [HW_total, 2], level_sizes list)."""
    xs, lows, highs, sizes = [], [], [], []
    for i, s in enumerate(strides):
        fh, fw = feature_shape(pad_hw, s)
        x = (np.arange(fw, dtype=np.float32)) * s + s / 2.0
        y = (np.arange(fh, dtype=np.float32)) * s + s / 2.0
        gx, gy = np.meshgrid(x, y)
        xy = np.stack([gx.reshape(-1), gy.reshape(-1)], 1)
        xs.append(xy)
        lo, hi = STAGE_BOUNDS[min(i, len(STAGE_BOUNDS) - 1)]
        lows.append(np.full(len(xy), lo, np.float32))
        highs.append(np.full(len(xy), hi, np.float32))
        sizes.append((fh, fw))
    return (np.concatenate(xs, 0), np.stack(
        [np.concatenate(lows), np.concatenate(highs)], 1), sizes)


def fcos_targets(gt_bbox, im_hw, locations, bounds):
    """Single image FCOS gt. locations [HW,2], bounds [HW,2].

    Returns (cls_label [HW] float {-1 ignore, 0 bg, k class},
    centerness [HW] (-1 ignore), offsets [HW, 4], nonignore [HW] bool).
    """
    xy = locations
    gt_valid = gt_bbox[:, 4] != -1
    l = xy[:, 0:1] - gt_bbox[None, :, 0]        # [HW, G]
    t = xy[:, 1:2] - gt_bbox[None, :, 1]
    r = gt_bbox[None, :, 2] - xy[:, 0:1]
    b = gt_bbox[None, :, 3] - xy[:, 1:2]
    offs = jnp.stack([l, t, r, b], -1)          # [HW, G, 4]
    in_box = jnp.min(offs, -1) >= 0
    max_off = jnp.max(offs, -1)
    in_stage = (max_off >= bounds[:, 0:1]) & (max_off < bounds[:, 1:2])
    ok = in_box & in_stage & gt_valid[None, :]

    area = (l + r) * (t + b)
    area = jnp.where(ok, area, 1e10)
    best = jnp.argmin(area, axis=1)             # [HW]
    has = jnp.any(ok, axis=1)

    sel = jnp.take_along_axis(offs, best[:, None, None], 1)[:, 0]  # [HW, 4]
    sel = jnp.where(has[:, None], sel, 0.0)
    cls = jnp.where(has, gt_bbox[best, 4], 0.0)

    lr = jnp.stack([sel[:, 0], sel[:, 2]], -1)
    tb = jnp.stack([sel[:, 1], sel[:, 3]], -1)
    ctr = jnp.sqrt(jnp.maximum(
        (jnp.min(lr, -1) * jnp.min(tb, -1))
        / jnp.maximum(jnp.max(lr, -1) * jnp.max(tb, -1), 1e-10), 0.0))
    ctr = jnp.where(has, ctr, 0.0)

    nonignore = (xy[:, 0] < im_hw[1]) & (xy[:, 1] < im_hw[0])
    cls = jnp.where(nonignore, cls, -1.0)
    ctr = jnp.where(nonignore, ctr, -1.0)
    return cls, ctr, sel, nonignore


class FCOSHeadModule(nn.Module):
    """Per-level outputs: (centerness [B,H,W,1], cls [B,H,W,C-1],
    offsets [B,H,W,4] post-exp, image units)."""
    num_fg_class: int
    conv_channel: int = 256
    num_group: int = 32
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pyramid):
        convs = {}
        for branch in ("shared", "offset"):
            for i in range(1, 5):
                convs[f"{branch}{i}"] = nn.Conv(
                    self.conv_channel, (3, 3),
                    kernel_init=nn.initializers.normal(0.01),
                    dtype=self.dtype, name=f"{branch}_conv{i}")
        center_conv = nn.Conv(1, (3, 3),
                              kernel_init=nn.initializers.normal(0.01),
                              name="center_conv")
        cls_conv = nn.Conv(self.num_fg_class, (3, 3),
                           kernel_init=nn.initializers.normal(0.01),
                           bias_init=nn.initializers.constant(
                               -math.log(99.0)),
                           name="cls_conv")
        offset_conv = nn.Conv(4, (3, 3),
                              kernel_init=nn.initializers.normal(0.01),
                              name="offset_conv")

        out = {}
        keys = sorted(pyramid, key=lambda s: int(s.replace("stride", "")))
        for key in keys:
            x = pyramid[key].astype(self.dtype)
            c = x
            for i in range(1, 5):
                c = convs[f"shared{i}"](c)
                c = nn.GroupNorm(num_groups=self.num_group,
                                 name=f"shared_gn{i}_{key}")(c)
                c = nn.relu(c)
            c32 = c.astype(jnp.float32)
            center = center_conv(c32)
            cls = cls_conv(c32)
            o = x
            for i in range(1, 5):
                o = convs[f"offset{i}"](o)
                o = nn.GroupNorm(num_groups=self.num_group,
                                 name=f"offset_gn{i}_{key}")(o)
                o = nn.relu(o)
            off = offset_conv(o.astype(jnp.float32))
            scale = self.param(f"offset_scale_{key}",
                               nn.initializers.ones, (1,), jnp.float32)
            off = jnp.exp(off * scale)
            out[key] = (center, cls, off)
        return out


class FCOSHead:
    """Stateless loss/decode helper around FCOSHeadModule."""

    def __init__(self, p):
        self.p = p
        self.strides = tuple(p.FCOSParam.stride)
        self.num_fg_class = p.FCOSParam.num_classifier
        self.module = FCOSHeadModule(
            num_fg_class=self.num_fg_class,
            conv_channel=p.head.conv_channel or 256,
            dtype=getattr(p, "dtype", jnp.float32))

    def flatten(self, outs, pad_hw):
        keys = sorted(outs, key=lambda s: int(s.replace("stride", "")))
        ctr, cls, off = [], [], []
        for key in keys:
            c, k, o = outs[key]
            b = c.shape[0]
            ctr.append(c.reshape(b, -1))
            cls.append(k.reshape(b, -1, self.num_fg_class))
            off.append(o.reshape(b, -1, 4))
        return (jnp.concatenate(ctr, 1), jnp.concatenate(cls, 1),
                jnp.concatenate(off, 1))

    def loss(self, outs, gt_bbox, im_info, pad_hw):
        p = self.p
        ctr_logit, cls_logit, off_pred = self.flatten(outs, pad_hw)
        locations, bounds, _ = fcos_locations(pad_hw, self.strides)
        locations = jnp.asarray(locations)
        bounds = jnp.asarray(bounds)

        cls_gt, ctr_gt, off_gt, nonign = jax.vmap(
            lambda g, hw: fcos_targets(g, hw, locations, bounds))(
            gt_bbox, im_info[:, :2])
        cls_gt = jax.lax.stop_gradient(cls_gt)
        ctr_gt = jax.lax.stop_gradient(ctr_gt)
        off_gt = jax.lax.stop_gradient(off_gt)

        alpha = p.loss_setting.focal_loss_alpha or 0.25
        gamma = p.loss_setting.focal_loss_gamma or 2.0
        from simpledet_tpu.ops.losses import sigmoid_focal_loss
        focal = sigmoid_focal_loss(cls_logit, cls_gt, alpha=alpha,
                                   gamma=gamma)
        num_pos = jnp.sum((cls_gt >= 1.0).astype(jnp.float32))
        cls_loss = jnp.sum(focal) / (num_pos + 1.0)

        # centerness BCE over positive, non-ignored locations
        pos = (ctr_gt > 0) & nonign
        pc = jnp.clip(jax.nn.sigmoid(ctr_logit), 1e-5, 1.0)
        bce = -(ctr_gt * jnp.log(pc) + (1 - ctr_gt) * jnp.log(
            jnp.clip(1 - pc, 1e-5, 1.0)))
        ctr_loss = jnp.sum(jnp.where(pos, bce, 0.0)) / (
            jnp.sum(pos.astype(jnp.float32)) + 1e-30)

        # IoU loss weighted by gt centerness
        w = jnp.where(pos, ctr_gt, 0.0)
        li, ti, ri, bi = (off_pred[..., i] for i in range(4))
        lg, tg, rg, bg = (off_gt[..., i] for i in range(4))
        inter = (jnp.minimum(li, lg) + jnp.minimum(ri, rg)) * \
                (jnp.minimum(ti, tg) + jnp.minimum(bi, bg))
        union = (li + ri) * (ti + bi) + (lg + rg) * (tg + bg) - inter
        iou_l = -jnp.log((inter + 1.0) / (union + 1.0))
        off_loss = jnp.sum(iou_l * w) / (jnp.sum(w) + 1e-30)

        losses = {"fcos_cls_loss": cls_loss, "fcos_centerness_loss": ctr_loss,
                  "fcos_offset_loss": off_loss}
        aux = {"fcos_cls_label": cls_gt, "fcos_num_pos": num_pos}
        return losses, aux

    def prediction(self, outs, im_info, pad_hw):
        """Per-level thresholded top-k decode -> sparse per-class scores.

        Returns (cls_score [B, K, num_class], boxes [B, K, 4], valid [B, K]).
        """
        p = self.p
        top_n = p.proposal.pre_nms_top_n or 1000
        thresh = p.proposal.pre_nms_thresh or 0.05
        keys = sorted(outs, key=lambda s: int(s.replace("stride", "")))
        locations, _, sizes = fcos_locations(pad_hw, self.strides)
        # split per level
        offsets_per_level = np.cumsum([0] + [h * w for h, w in sizes])

        def per_level(ctr, cls, off, loc, hw):
            nfg = self.num_fg_class
            cls_prob = jax.nn.sigmoid(cls.reshape(-1, nfg))
            ctr_prob = jax.nn.sigmoid(ctr.reshape(-1, 1))
            cand = cls_prob > thresh
            score = cls_prob * ctr_prob
            flat = jnp.where(cand, score, NEG_INF).reshape(-1)
            k = min(top_n, flat.shape[0])
            top_scores, idx = fast_top_k(flat, k)
            loc_idx = idx // nfg
            cls_idx = idx % nfg
            o = off.reshape(-1, 4)[loc_idx]
            x = loc[loc_idx, 0]
            y = loc[loc_idx, 1]
            boxes = jnp.stack([
                jnp.clip(x - o[:, 0], 0, hw[1]),
                jnp.clip(y - o[:, 1], 0, hw[0]),
                jnp.clip(x + o[:, 2], 0, hw[1]),
                jnp.clip(y + o[:, 3], 0, hw[0])], -1)
            ok = top_scores > NEG_INF / 2
            return boxes, jnp.where(ok, top_scores, 0.0), cls_idx + 1, ok

        all_b, all_s, all_c, all_ok = [], [], [], []
        for i, key in enumerate(keys):
            ctr, cls, off = outs[key]
            loc = jnp.asarray(
                locations[offsets_per_level[i]:offsets_per_level[i + 1]])
            bx, sc, cl, ok = jax.vmap(
                lambda c_, k_, o_, hw: per_level(c_, k_, o_, loc, hw))(
                ctr, cls, off, im_info[:, :2])
            all_b.append(bx)
            all_s.append(sc)
            all_c.append(cl)
            all_ok.append(ok)
        boxes = jnp.concatenate(all_b, 1)
        scores = jnp.concatenate(all_s, 1)
        cls = jnp.concatenate(all_c, 1)
        ok = jnp.concatenate(all_ok, 1)
        num_class = self.num_fg_class + 1
        onehot = jax.nn.one_hot(cls, num_class, dtype=scores.dtype)
        cls_score = onehot * scores[..., None] * ok[..., None]
        return cls_score, boxes, ok


class FCOS(nn.Module):
    """Anchor-free single-stage assembly (reference uses the RPN detector
    singleton, config/fcos_r50v1_fpn_1x.py:1)."""
    backbone: nn.Module
    neck: nn.Module
    head_module: nn.Module
    head: Any

    @nn.compact
    def __call__(self, data, im_info, gt_bbox=None, mode="train"):
        pad_hw = data.shape[1:3]
        pyr = self.neck(self.backbone(data))
        outs = self.head_module(pyr)
        if mode == "train":
            return self.head.loss(outs, gt_bbox, im_info, pad_hw)
        cls_score, boxes, valid = self.head.prediction(outs, im_info, pad_hw)
        num_class = self.head.num_fg_class + 1
        return {"cls_score": cls_score,
                "bbox_xyxy": jnp.tile(boxes, (1, 1, num_class)),
                "det_valid": valid}
