"""CrowdHuman double-prediction detector (EMD loss + set-NMS).

TPU rewrite of the reference models/crowdhuman/builder.py:
  * DoublePredBboxHead (:50-330): one 2fc trunk with TWO (cls, reg) output
    pairs; EMD loss takes the permutation with the smaller total
    (CE + weighted smooth-L1) against the (best, second-best) gt targets,
    mean over rois (:254-307). Optional refine mode is not ported (marked
    experimental in the reference).
  * second-gt targets come from targets/proposal_target.proposal_target_double
    (reference bbox_sec_target.py).
  * test (:109-180): both predictions decoded; boxes from the same roi share
    a set id so set-NMS (operator_py/nms.py:77 set_nms) keeps co-set boxes.
"""
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from simpledet_tpu.models.faster_rcnn import FasterRcnn
from simpledet_tpu.models.fpn import xavier_in_uniform
from simpledet_tpu.ops.bbox import clip_boxes, decode_boxes
from simpledet_tpu.ops.losses import smooth_l1
from simpledet_tpu.targets.proposal_target import \
    batched_proposal_target_double


class DoublePredBbox2fcHead(nn.Module):
    """roi_feat [B,R,P,P,C] -> (cls1, reg1, cls2, reg2)[, refined quad].

    refine=True adds the reference's refine module (builder.py:191-252
    get_refine_output): each branch's softmaxed fg probs + fg deltas are
    tiled repeat_time times, concatenated onto the fc2 trunk feature, passed
    through a weight-shared fc3 (1024) and fresh cls/reg fcs."""
    num_class: int
    num_reg_class: int
    refine: bool = False
    repeat_time: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, roi_feat):
        b, r = roi_feat.shape[:2]
        x = roi_feat.reshape(b, r, -1).astype(self.dtype)
        x = nn.Dense(1024, kernel_init=xavier_in_uniform, dtype=self.dtype,
                     name="fc1")(x)
        x = nn.relu(x)
        x = nn.Dense(1024, kernel_init=xavier_in_uniform, dtype=self.dtype,
                     name="fc2")(x)
        x = nn.relu(x).astype(jnp.float32)
        outs = []
        for i in (1, 2):
            cls = nn.Dense(self.num_class,
                           kernel_init=nn.initializers.normal(0.01),
                           name=f"cls_logit{i}")(x)
            reg = nn.Dense(4 * self.num_reg_class,
                           kernel_init=nn.initializers.normal(0.001),
                           name=f"bbox_delta{i}")(x)
            outs.extend([cls, reg])
        if not self.refine:
            return tuple(outs)

        fc3 = nn.Dense(1024, kernel_init=xavier_in_uniform,
                       name="fc3_refine")                # shared across branches
        for i, (cls, reg) in enumerate(((outs[0], outs[1]),
                                        (outs[2], outs[3])), start=1):
            fg_prob = jax.nn.softmax(cls, -1)[..., 1:]   # drop background
            fg_delta = reg[..., 4:]                      # drop bg deltas
            pred = jnp.tile(jnp.concatenate([fg_delta, fg_prob], -1),
                            (1, 1, self.repeat_time))
            h = nn.relu(fc3(jnp.concatenate([x, pred], -1)))
            rcls = nn.Dense(self.num_class,
                            kernel_init=nn.initializers.normal(0.01),
                            name=f"refine_cls_logit{i}")(h)
            rreg = nn.Dense(4 * self.num_reg_class,
                            kernel_init=nn.initializers.normal(0.001),
                            name=f"refine_bbox_delta{i}")(h)
            outs.extend([rcls, rreg])
        return tuple(outs)


def emd_loss(cls1, reg1, cls2, reg2, label1, target1, weight1,
             label2, target2, weight2, smooth_l1_scalar=1.0):
    """Permutation-min EMD loss (reference emd_loss :254-307).

    All label/target/weight pairs are [B, R, ...]; returns scalar mean."""
    def ce(logit, label):
        logp = jax.nn.log_softmax(logit, -1)
        return -jnp.take_along_axis(
            logp, label.astype(jnp.int32)[..., None], -1)[..., 0]

    def reg_l(reg, target, weight):
        return jnp.sum(weight * smooth_l1(reg - target,
                                          sigma=smooth_l1_scalar), -1)

    loss_a = (ce(cls1, label1) + ce(cls2, label2)
              + reg_l(reg1, target1, weight1)
              + reg_l(reg2, target2, weight2))
    loss_b = (ce(cls1, label2) + ce(cls2, label1)
              + reg_l(reg1, target2, weight2)
              + reg_l(reg2, target1, weight1))
    return jnp.mean(jnp.minimum(loss_a, loss_b))


class DoublePredRcnn(FasterRcnn):
    """Two predictions per roi; shares the FasterRcnn RPN/roi machinery."""

    @nn.compact
    def __call__(self, data, im_info, gt_bbox=None, mode="train"):
        pad_hw = data.shape[1:3]
        pyr = self.pyramid(data)
        rpn_out = self.rpn_module(pyr)

        if mode == "rpn_test":
            boxes, scores = self.rpn.proposals(rpn_out, im_info, pad_hw,
                                               is_train=False)
            return {"proposal": boxes, "proposal_score": scores}

        ps = self.p_rpn.subsample_proposal
        pt = self.p_rpn.bbox_target

        if mode == "train":
            rng_anchor = self.make_rng("sampling")
            rng_sample = self.make_rng("sampling")
            rpn_losses, rpn_aux = self.rpn.loss(rng_anchor, rpn_out, gt_bbox,
                                                im_info, pad_hw)
            proposals, _ = self.rpn.proposals(rpn_out, im_info, pad_hw,
                                              is_train=True)
            sample = batched_proposal_target_double(
                rng_sample, proposals, gt_bbox,
                image_rois=ps.image_roi, fg_fraction=ps.fg_fraction,
                fg_thr=ps.fg_thr, bg_thr_hi=ps.bg_thr_hi,
                bg_thr_lo=ps.bg_thr_lo, num_reg_class=pt.num_reg_class,
                class_agnostic=pt.class_agnostic,
                proposal_wo_gt=ps.proposal_wo_gt or False,
                bbox_mean=pt.mean, bbox_std=pt.std, bbox_weight=pt.weight)
            sample = jax.lax.stop_gradient(sample)

            roi_feat = self.extract_rois(pyr, sample["rois"])
            head_out = self.bbox_head(roi_feat)
            cls1, reg1, cls2, reg2 = head_out[:4]
            sl = getattr(self.p_bbox.regress_target, "smooth_l1_scalar",
                         None) or 1.0

            def _emd(c1, r1, c2, r2):
                return emd_loss(
                    c1, r1, c2, r2,
                    sample["label"], sample["bbox_target"],
                    sample["bbox_weight"], sample["sec_label"],
                    sample["sec_bbox_target"], sample["sec_bbox_weight"],
                    smooth_l1_scalar=sl)

            losses = {"emd_loss": _emd(cls1, reg1, cls2, reg2)}
            if len(head_out) == 8:   # refine mode: second EMD on refined out
                losses["refine_emd_loss"] = _emd(*head_out[4:])
            losses.update(rpn_losses)
            aux = dict(rpn_aux)
            aux["bbox_label"] = sample["label"]
            aux["bbox_cls_logit"] = cls1
            return losses, aux

        # test: both predictions, shared set id per roi
        proposals, prop_scores = self.rpn.proposals(rpn_out, im_info, pad_hw,
                                                    is_train=False)
        roi_feat = self.extract_rois(pyr, proposals)
        head_out = self.bbox_head(roi_feat)
        # refine mode: test uses the refined predictions (reference
        # get_prediction :119-123 replaces the raw pair)
        cls1, reg1, cls2, reg2 = head_out[4:] if len(head_out) == 8 \
            else head_out[:4]
        rt = self.p_bbox.regress_target
        num_class = self.p_bbox.num_class

        def decode_one(logit, delta):
            score = jax.nn.softmax(logit, -1)
            boxes = decode_boxes(proposals, delta, means=rt.mean,
                                 stds=rt.std)
            boxes = clip_boxes(boxes, im_info[:, None, :2])
            if rt.class_agnostic or False:
                boxes = jnp.tile(boxes[..., 4:8], (1, 1, num_class))
            return score, boxes

        s1, b1 = decode_one(cls1, reg1)
        s2, b2 = decode_one(cls2, reg2)
        r = proposals.shape[1]
        set_idx = jnp.broadcast_to(jnp.arange(r)[None], (s1.shape[0], r))
        return {"cls_score": jnp.concatenate([s1, s2], 1),
                "bbox_xyxy": jnp.concatenate([b1, b2], 1),
                "set_index": jnp.concatenate([set_idx, set_idx], 1),
                "rois": proposals, "roi_score": prop_scores}
