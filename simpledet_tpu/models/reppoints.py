"""RepPoints: point-set representation with a two-stage (init/refine) head.

TPU rewrite of the reference models/RepPoints/builder.py RepPointsHead:
  * shared 3-conv cls/reg towers (per-stride norm), init-points conv
    (3x3 + 1x1 -> 2*num_points, y-first offsets in stride units);
  * refine stage: a deformable conv on both towers using the init offsets
    (minus the regular grid) — ops/deform_conv — feeding the cls output
    (bias -log(99)) and the residual point refinement (:265-310);
  * init offsets enter the refine dcn with 0.1 gradient multiplier
    (:291 pts_out_init_grad_mul);
  * losses (:311-470): focal on refine IoU-assigned labels ('valid' fg
    normalization), smooth-L1(sigma 3) on (box - gt)/(stride*scale) for
    both stages (init weight 0.5), init targets by k-nearest point
    assignment, refine targets by IoU assignment on init boxes;
  * test: points2bbox on refine offsets, per-level thresholded top-k.
"""
import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from simpledet_tpu.ops.deform_conv import batched_deform_conv2d
from simpledet_tpu.ops.losses import sigmoid_focal_loss, smooth_l1
from simpledet_tpu.ops.nms import NEG_INF
from simpledet_tpu.ops.topk import fast_top_k
from simpledet_tpu.ops.points import (gen_dcn_offsets, gen_points, iou_assign,
                                      offset_to_pts, point_assign,
                                      points2bbox)


class RepPointsHeadModule(nn.Module):
    """Per-level: (pts_init [B,H,W,2n], pts_refine [B,H,W,2n],
    cls [B,H,W,C-1])."""
    num_fg_class: int
    num_points: int = 9
    conv_channel: int = 256
    point_conv_channel: int = 256
    norm: Any = None
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pyramid):
        n2 = self.num_points * 2
        dcn_kernel = int(math.sqrt(self.num_points))
        dcn_base = jnp.asarray(gen_dcn_offsets(dcn_kernel,
                                               (dcn_kernel - 1) // 2))
        pi = -math.log(99.0)

        convs = {}
        for branch in ("cls", "reg"):
            for i in (1, 2, 3):
                convs[f"{branch}{i}"] = nn.Conv(
                    self.conv_channel, (3, 3),
                    kernel_init=nn.initializers.normal(0.01),
                    dtype=self.dtype, name=f"{branch}_conv{i}")
        pts_init_conv = nn.Conv(self.point_conv_channel, (3, 3),
                                kernel_init=nn.initializers.normal(0.01),
                                dtype=self.dtype, name="pts_init_conv")
        pts_init_out = nn.Conv(n2, (1, 1),
                               kernel_init=nn.initializers.normal(0.01),
                               name="pts_init_out")
        cls_dcn_kernel = self.param(
            "cls_conv_kernel", nn.initializers.normal(0.01),
            (dcn_kernel, dcn_kernel, self.conv_channel,
             self.point_conv_channel), jnp.float32)
        cls_out = nn.Conv(self.num_fg_class, (1, 1),
                          kernel_init=nn.initializers.normal(0.01),
                          bias_init=nn.initializers.constant(pi),
                          name="cls_out")
        refine_dcn_kernel = self.param(
            "pts_refine_conv_kernel", nn.initializers.normal(0.01),
            (dcn_kernel, dcn_kernel, self.conv_channel,
             self.point_conv_channel), jnp.float32)
        pts_refine_out = nn.Conv(n2, (1, 1),
                                 kernel_init=nn.initializers.normal(0.01),
                                 name="pts_refine_out")

        out = {}
        keys = sorted((k for k in pyramid if k.startswith("stride")),
                      key=lambda s: int(s.replace("stride", "")))
        for key in keys:
            x = pyramid[key].astype(self.dtype)
            c = x
            r = x
            for i in (1, 2, 3):
                c = convs[f"cls{i}"](c)
                r = convs[f"reg{i}"](r)
                if self.norm is not None:
                    c = self.norm(name=f"cls_conv{i}_bn_{key}")(c)
                    r = self.norm(name=f"reg_conv{i}_bn_{key}")(r)
                c = nn.relu(c)
                r = nn.relu(r)
            c = c.astype(jnp.float32)
            r = r.astype(jnp.float32)

            init_feat = nn.relu(pts_init_conv(r).astype(jnp.float32))
            pts_init = pts_init_out(init_feat)             # [B,H,W,2n]

            # refine dcn input offsets: grad-mul 0.1, minus the base grid
            pts_gm = 0.9 * jax.lax.stop_gradient(pts_init) + 0.1 * pts_init
            dcn_off = pts_gm - dcn_base

            cls_feat = nn.relu(batched_deform_conv2d(
                c, dcn_off, cls_dcn_kernel, stride=1,
                num_deformable_group=1))
            cls = cls_out(cls_feat)

            refine_feat = nn.relu(batched_deform_conv2d(
                r, dcn_off, refine_dcn_kernel, stride=1,
                num_deformable_group=1))
            pts_refine = pts_refine_out(refine_feat) + jax.lax.stop_gradient(
                pts_init)
            out[key] = (pts_init, pts_refine, cls)
        return out


class RepPointsHead:
    """Loss/decode helper."""

    def __init__(self, p):
        self.p = p
        self.strides = tuple(p.point_generate.stride)
        self.num_points = p.point_generate.num_points or 9
        self.transform = p.point_generate.transform or "minmax"
        self.num_fg_class = p.num_class - 1
        self.module = RepPointsHeadModule(
            num_fg_class=self.num_fg_class, num_points=self.num_points,
            conv_channel=p.head.conv_channel or 256,
            point_conv_channel=(p.head.point_conv_channel
                                or p.head.conv_channel or 256),
            norm=None, dtype=getattr(p, "dtype", jnp.float32))
        # moment transform learnable transfer (lr_mult 0.01 in reference;
        # here plain param — schedule difference documented)
        self.needs_moment = self.transform == "moment"

    def _points(self, outs):
        keys = sorted(outs, key=lambda s: int(s.replace("stride", "")))
        pts = []
        for key, s in zip(keys, self.strides):
            h, w = outs[key][0].shape[1:3]
            pts.append(gen_points(h, w, s))
        return np.concatenate(pts, 0), keys

    def _flatten(self, outs, keys):
        n2 = self.num_points * 2
        init_l, refine_l, cls_l, stride_l = [], [], [], []
        for key, s in zip(keys, self.strides):
            pi, pr, c = outs[key]
            b = c.shape[0]
            init_l.append(pi.reshape(b, -1, n2))
            refine_l.append(pr.reshape(b, -1, n2))
            cls_l.append(c.reshape(b, -1, self.num_fg_class))
            stride_l.append(np.full(pi.shape[1] * pi.shape[2], s,
                                    np.float32))
        return (jnp.concatenate(init_l, 1), jnp.concatenate(refine_l, 1),
                jnp.concatenate(cls_l, 1), np.concatenate(stride_l))

    def loss(self, outs, gt_bbox, im_info, pad_hw, moment_transfer=None):
        p = self.p
        points_np, keys = self._points(outs)
        points = jnp.asarray(points_np)
        pts_init, pts_refine, cls_logit, strides_np = self._flatten(outs,
                                                                    keys)
        strides = jnp.asarray(strides_np)
        mt = moment_transfer

        def img_boxes(pred):
            """offset preds [N, 2n] -> boxes [N, 4] in image coords."""
            pts = offset_to_pts(points, pred, strides[:, None],
                                self.num_points)
            return points2bbox(pts, self.transform, y_first=False,
                               moment_transfer=mt)

        boxes_init = jax.vmap(img_boxes)(pts_init)
        boxes_refine = jax.vmap(img_boxes)(pts_refine)

        # init targets: point assignment on location centers
        ts = p.point_target
        lbl_init, gts_init = jax.vmap(
            lambda g: point_assign(points, g, ts.target_scale or 4,
                                   ts.num_pos or 1))(gt_bbox)
        # refine targets: IoU assignment on (stop-grad) init boxes
        bt = p.bbox_target
        lbl_ref, gts_ref = jax.vmap(
            lambda b, g: iou_assign(b, g, bt.pos_iou_thr or 0.5,
                                    bt.neg_iou_thr or 0.4,
                                    bt.min_pos_iou or 0.0))(
            jax.lax.stop_gradient(boxes_init), gt_bbox)
        lbl_init = jax.lax.stop_gradient(lbl_init)
        gts_init = jax.lax.stop_gradient(gts_init)
        lbl_ref = jax.lax.stop_gradient(lbl_ref)
        gts_ref = jax.lax.stop_gradient(gts_ref)

        # cls: focal on refine labels, 'valid' normalization
        focal = sigmoid_focal_loss(cls_logit, lbl_ref,
                                   alpha=p.focal_loss.alpha or 0.25,
                                   gamma=p.focal_loss.gamma or 2.0)
        n_fg = jnp.maximum(jnp.sum(lbl_ref >= 1.0), 1.0)
        cls_loss = jnp.sum(focal) / n_fg

        norm_term = strides[None, :, None] * (p.point_generate.scale or 4)

        def box_loss(boxes, gts, lbl):
            w = (lbl >= 1.0).astype(jnp.float32)[..., None]
            l1 = smooth_l1((boxes - gts) / norm_term, sigma=3.0)
            return jnp.sum(l1 * w) / jnp.maximum(jnp.sum(w), 1.0)

        init_loss = 0.5 * box_loss(boxes_init, gts_init, lbl_init)
        refine_loss = box_loss(boxes_refine, gts_ref, lbl_ref)

        losses = {"reppoints_cls_loss": cls_loss,
                  "reppoints_init_loss": init_loss,
                  "reppoints_refine_loss": refine_loss}
        aux = {"reppoints_label": lbl_ref}
        return losses, aux

    def prediction(self, outs, im_info, pad_hw, moment_transfer=None):
        p = self.p
        top_n = p.proposal.pre_nms_top_n or 1000
        thresh = p.proposal.min_det_score or 0.05
        points_np, keys = self._points(outs)
        mt = moment_transfer

        all_b, all_s, all_c, all_ok = [], [], [], []
        offset = 0
        for key, s in zip(keys, self.strides):
            pi, pr, c = outs[key]
            b, h, w, _ = c.shape
            n = h * w
            loc = jnp.asarray(points_np[offset:offset + n])
            offset += n

            def per_image(pred, logit, hw):
                pts = offset_to_pts(loc, pred.reshape(n, -1), s,
                                    self.num_points)
                boxes = points2bbox(pts, self.transform, y_first=False,
                                    moment_transfer=mt)
                boxes = jnp.stack([
                    jnp.clip(boxes[:, 0], 0, hw[1]),
                    jnp.clip(boxes[:, 1], 0, hw[0]),
                    jnp.clip(boxes[:, 2], 0, hw[1]),
                    jnp.clip(boxes[:, 3], 0, hw[0])], -1)
                prob = jax.nn.sigmoid(logit.reshape(n, -1))
                flat = jnp.where(prob > thresh, prob, NEG_INF).reshape(-1)
                k = min(top_n, flat.shape[0])
                sc, idx = fast_top_k(flat, k)
                loc_idx = idx // self.num_fg_class
                cls_idx = idx % self.num_fg_class
                ok = sc > NEG_INF / 2
                return (boxes[loc_idx], jnp.where(ok, sc, 0.0),
                        cls_idx + 1, ok)

            bx, sc, cl, ok = jax.vmap(
                lambda pred, logit, hw: per_image(pred, logit, hw))(
                pr, c, im_info[:, :2])
            all_b.append(bx)
            all_s.append(sc)
            all_c.append(cl)
            all_ok.append(ok)

        boxes = jnp.concatenate(all_b, 1)
        scores = jnp.concatenate(all_s, 1)
        cls = jnp.concatenate(all_c, 1)
        ok = jnp.concatenate(all_ok, 1)
        onehot = jax.nn.one_hot(cls, self.p.num_class, dtype=scores.dtype)
        return onehot * scores[..., None] * ok[..., None], boxes, ok


class RepPoints(nn.Module):
    backbone: nn.Module
    neck: nn.Module
    head_module: nn.Module
    head: Any

    @nn.compact
    def __call__(self, data, im_info, gt_bbox=None, mode="train"):
        pad_hw = data.shape[1:3]
        pyr = self.neck(self.backbone(data))
        outs = self.head_module(pyr)
        mt = None
        if self.head.needs_moment:
            mt = self.param("moment_transfer", nn.initializers.zeros, (2,),
                            jnp.float32)
        if mode == "train":
            return self.head.loss(outs, gt_bbox, im_info, pad_hw,
                                  moment_transfer=mt)
        cls_score, boxes, valid = self.head.prediction(outs, im_info, pad_hw,
                                                       moment_transfer=mt)
        num_class = self.head.p.num_class
        return {"cls_score": cls_score,
                "bbox_xyxy": jnp.tile(boxes, (1, 1, num_class)),
                "det_valid": valid}
