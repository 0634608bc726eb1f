"""FPN RPN head: weight-shared per-level conv head + losses + proposals.

Mirrors FPNRpnHead (reference models/FPN/builder.py:66-369): a 3x3 conv
(shared across levels, gaussian 0.01 init) feeding 1x1 cls (2A) / reg (4A)
convs, softmax-with-ignore cls loss ('valid' normalization), smooth-L1 reg
loss scaled by 1/(batch*image_anchor), per-level proposal generation + NMS
and cross-level top-k (Proposal_v3 + get_top_proposal).

Anchor targets are produced IN-GRAPH (targets/anchor_target.py) from the
concatenated multi-level anchor grid, which is the reference's
PyramidAnchorTarget2D (models/FPN/input.py:55-148) moved on-device.

Logit layout: [B, H, W, A*2] reshaped to [B, H*W*A, 2] with (bg, fg) pairs
per anchor — flat (y, x, anchor) order matching ops/anchors.generate_anchor_grid.
"""
from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from simpledet_tpu.ops.anchors import generate_anchor_grid
from simpledet_tpu.targets.anchor_target import batched_anchor_target
from simpledet_tpu.targets.proposal import gen_proposals, top_proposals


def feature_shape(pad_hw, stride):
    """SAME-padding feature dims: ceil(dim / stride)."""
    return (-(-pad_hw[0] // stride), -(-pad_hw[1] // stride))


class RpnConvHead(nn.Module):
    """Shared-weight conv head applied to each pyramid level."""
    num_anchor: int
    conv_channel: int = 256
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pyramid):
        conv = nn.Conv(self.conv_channel, (3, 3),
                       kernel_init=nn.initializers.normal(0.01),
                       dtype=self.dtype, name="rpn_conv")
        cls = nn.Conv(2 * self.num_anchor, (1, 1),
                      kernel_init=nn.initializers.normal(0.01),
                      name="rpn_cls")
        reg = nn.Conv(4 * self.num_anchor, (1, 1),
                      kernel_init=nn.initializers.normal(0.01),
                      name="rpn_reg")
        out = {}
        keys = [k for k in pyramid if k.startswith("stride")]
        for key in sorted(keys, key=lambda s: int(s.replace("stride", ""))):
            x = nn.relu(conv(pyramid[key]))
            x32 = x.astype(jnp.float32)
            out[key] = (cls(x32), reg(x32))
        return out


class FPNRpnHead:
    """Stateless composition: flax head module + pure target/proposal fns.

    Config params mirror RpnParam (config/faster_r50v1_fpn_1x.py:41-87).
    """

    def __init__(self, p):
        self.p = p
        gen = p.anchor_generate
        self.strides = tuple(gen.stride)
        self.scales = tuple(gen.scale) if hasattr(gen.scale, "__len__") else (gen.scale,)
        self.ratios = tuple(gen.ratio)
        self.num_anchor = len(self.scales) * len(self.ratios)
        self.module = RpnConvHead(num_anchor=self.num_anchor,
                                  conv_channel=p.head.conv_channel,
                                  dtype=getattr(p, "dtype", jnp.float32))

    def anchors_for(self, pad_hw):
        """Concatenated constant anchor grid for a padded image shape."""
        grids = []
        for s in self.strides:
            fh, fw = feature_shape(pad_hw, s)
            grids.append(generate_anchor_grid(fh, fw, s, self.scales, self.ratios))
        return jnp.asarray(np.concatenate(grids, axis=0))

    def _level_shapes(self, level_outputs):
        """Actual per-level (H, W) from head outputs, in stride order.

        Necks whose extra levels come from clamped/VALID pooling (FPG, NASFPN
        tiny inputs) can deviate from ceil(dim/stride), so anchor grids must
        follow the real feature shapes, not the padded image shape.
        """
        keys = sorted(level_outputs,
                      key=lambda s: int(s.replace("stride", "")))
        return [level_outputs[k][0].shape[1:3] for k in keys]

    @staticmethod
    def flatten_outputs(level_outputs):
        """[B,H,W,kA] per level -> concat [B, sum(HWA), k] (k=2 cls, 4 reg)."""
        cls_list, reg_list = [], []
        for key in sorted(level_outputs, key=lambda s: int(s.replace("stride", ""))):
            cls, reg = level_outputs[key]
            b = cls.shape[0]
            cls_list.append(cls.reshape(b, -1, 2))
            reg_list.append(reg.reshape(b, -1, 4))
        return jnp.concatenate(cls_list, 1), jnp.concatenate(reg_list, 1)

    def loss(self, rng, level_outputs, gt_bbox, im_info, pad_hw):
        """Returns (loss dict, aux dict for metrics)."""
        p = self.p
        cls_logit, reg_delta = self.flatten_outputs(level_outputs)
        anchors = jnp.concatenate([
            jnp.asarray(generate_anchor_grid(fh, fw, s, self.scales,
                                             self.ratios))
            for s, (fh, fw) in zip(self.strides,
                                   self._level_shapes(level_outputs))], 0)
        label, target, weight = batched_anchor_target(
            rng, anchors, gt_bbox, im_info[:, :2],
            allowed_border=p.anchor_assign.allowed_border,
            neg_thr=p.anchor_assign.neg_thr, pos_thr=p.anchor_assign.pos_thr,
            min_pos_thr=p.anchor_assign.min_pos_thr,
            image_anchor=p.anchor_assign.image_anchor,
            fg_fraction=p.anchor_assign.pos_fraction,
            ignore_regions=bool(getattr(p, "ignore_regions", None)))
        label = jax.lax.stop_gradient(label)
        target = jax.lax.stop_gradient(target)
        weight = jax.lax.stop_gradient(weight)

        # cls: softmax CE, ignore -1, normalized by valid count
        valid = label >= 0
        logp = jax.nn.log_softmax(cls_logit, axis=-1)
        pick = jnp.where(label == 1, logp[..., 1], logp[..., 0])
        n_valid = jnp.maximum(jnp.sum(valid), 1)
        cls_loss = -jnp.sum(jnp.where(valid, pick, 0.0)) / n_valid

        # reg: smooth-L1(sigma=3) / (batch * image_anchor)
        sigma2 = 3.0 ** 2
        diff = reg_delta - target
        ad = jnp.abs(diff)
        l1 = jnp.where(ad < 1.0 / sigma2, 0.5 * sigma2 * diff * diff,
                       ad - 0.5 / sigma2)
        batch = gt_bbox.shape[0]
        reg_loss = jnp.sum(weight * l1) / (batch * p.anchor_assign.image_anchor)

        losses = {"rpn_cls_loss": cls_loss, "rpn_reg_loss": reg_loss}
        aux = {"rpn_label": label, "rpn_cls_logit": cls_logit}
        return losses, aux

    def proposals(self, level_outputs, im_info, pad_hw, is_train):
        """Per-level decode + NMS, then cross-level top-k.

        Returns (boxes [B, post_nms_top_n, 4], scores [B, post_nms_top_n]).

        All levels' pre-NMS pools are padded to a common size and stacked so
        ONE vmapped NMS covers every (image, level) pair — per-level
        sequential NMS calls cost ~8ms each on TPU (tools/perf_probe_components.py).
        """
        from simpledet_tpu.ops.bbox import clip_boxes, decode_boxes
        from simpledet_tpu.ops.nms import NEG_INF, nms
        from simpledet_tpu.ops.topk import fast_top_k

        p = self.p
        pre = p.proposal.pre_nms_top_n
        post = p.proposal.post_nms_top_n
        nms_thr = p.proposal.nms_thr
        min_size = p.proposal.min_bbox_side or 0
        keys = sorted(level_outputs,
                      key=lambda s: int(s.replace("stride", "")))
        anchors = [jnp.asarray(generate_anchor_grid(fh, fw, s, self.scales,
                                                    self.ratios))
                   for s, (fh, fw) in zip(self.strides,
                                          self._level_shapes(level_outputs))]
        b = level_outputs[keys[0]][0].shape[0]
        n_level = len(keys)

        # per level: decode, clip, filter, top-(min(pre, n)); pad to pre
        lvl_boxes, lvl_scores = [], []
        for key, anc in zip(keys, anchors):
            cls, reg = level_outputs[key]
            prob = jax.nn.softmax(cls.reshape(b, -1, 2), axis=-1)[..., 1]
            deltas = reg.reshape(b, -1, 4)

            def per_image(sc, de, hw):
                boxes = decode_boxes(anc, de)
                boxes = clip_boxes(boxes, hw)
                ws = boxes[:, 2] - boxes[:, 0] + 1.0
                hs = boxes[:, 3] - boxes[:, 1] + 1.0
                valid = (ws >= min_size) & (hs >= min_size)
                masked = jnp.where(valid, sc, NEG_INF)
                k = min(pre, sc.shape[0])
                top_s, top_i = fast_top_k(masked, k)
                top_b = boxes[top_i]
                if k < pre:
                    top_s = jnp.pad(top_s, (0, pre - k),
                                    constant_values=NEG_INF)
                    top_b = jnp.pad(top_b, ((0, pre - k), (0, 0)))
                return top_b, top_s

            bx, sc = jax.vmap(per_image)(prob, deltas, im_info[:, :2])
            lvl_boxes.append(bx)
            lvl_scores.append(sc)

        # [B*L, pre, ...] -> one vmapped NMS over every (image, level)
        all_b = jnp.stack(lvl_boxes, 1).reshape(b * n_level, pre, 4)
        all_s = jnp.stack(lvl_scores, 1).reshape(b * n_level, pre)
        post_l = min(post, pre)
        ob, osc, _, ov = jax.vmap(
            lambda bx, sc: nms(bx, sc, nms_thr, post_l,
                               valid=sc > NEG_INF / 2))(all_b, all_s)
        osc = jnp.where(ov, osc, NEG_INF)

        # cross-level top-k per image
        ob = ob.reshape(b, n_level * post_l, 4)
        osc = osc.reshape(b, n_level * post_l)
        boxes, scores = jax.vmap(
            lambda bx, sc: top_proposals([bx], [sc], post))(ob, osc)
        return jax.lax.stop_gradient(boxes), jax.lax.stop_gradient(scores)

