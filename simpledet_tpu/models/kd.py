"""Knowledge distillation (FitNet) — reference models/KD/.

FitNetHead (builder.py:12-42): a 1x1 conv + relu adapter on a chosen
backbone stage; L2 hint loss against the teacher's feature, scaled by
grad_scale. FitNetFasterRcnn / FitNetRetinaNet (builder.py:45-105) add the
hint loss to the detector's losses; the teacher feature arrives as the
`teacher_label` input.

The reference ran the teacher with a second DetModule per batch
(KDDetModule, detection_module.py:48). Here `make_teacher_fn` returns a
jitted frozen-teacher forward producing teacher_label; the train CLI calls
it per batch (or the teacher can be fused into the same jit by passing its
module+params — both paths keep the teacher out of the gradient).
"""
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from simpledet_tpu.models.faster_rcnn import FasterRcnn
from simpledet_tpu.models.retinanet import RetinaNet


class FitNetHead(nn.Module):
    """Student hint adapter + L2 loss vs teacher feature."""
    channel: int
    stage: str = "c4"
    grad_scale: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, feat_dict, teacher_label):
        x = feat_dict[self.stage].astype(jnp.float32)
        hint = nn.Conv(self.channel, (1, 1), use_bias=True,
                       name="student_hint_conv")(x)
        hint = nn.relu(hint)
        return self.grad_scale * jnp.mean(
            (hint - jax.lax.stop_gradient(teacher_label)) ** 2)


class FitNetFasterRcnn(FasterRcnn):
    """Faster R-CNN + hint loss (reference FitNetFasterRcnn:71)."""
    kd_head: nn.Module = None

    @nn.compact
    def __call__(self, data, im_info, gt_bbox=None, teacher_label=None,
                 mode="train"):
        if mode != "train" or teacher_label is None:
            return super().__call__(data, im_info, gt_bbox, mode=mode)
        feats = self.backbone(data)
        # rebuild the detector path on the shared backbone features
        pyr = self.neck(feats)
        rpn_out = self.rpn_module(pyr)
        rng_anchor = self.make_rng("sampling")
        rng_sample = self.make_rng("sampling")
        rpn_losses, rpn_aux = self.rpn.loss(rng_anchor, rpn_out, gt_bbox,
                                            im_info, data.shape[1:3])
        proposals, _ = self.rpn.proposals(rpn_out, im_info, data.shape[1:3],
                                          is_train=True)
        from simpledet_tpu.models.heads import bbox_head_loss
        from simpledet_tpu.targets.proposal_target import \
            batched_proposal_target
        ps = self.p_rpn.subsample_proposal
        pt = self.p_rpn.bbox_target
        sample = batched_proposal_target(
            rng_sample, proposals, gt_bbox,
            image_rois=ps.image_roi, fg_fraction=ps.fg_fraction,
            fg_thr=ps.fg_thr, bg_thr_hi=ps.bg_thr_hi, bg_thr_lo=ps.bg_thr_lo,
            num_reg_class=pt.num_reg_class, class_agnostic=pt.class_agnostic,
            proposal_wo_gt=ps.proposal_wo_gt or False,
            bbox_mean=pt.mean, bbox_std=pt.std, bbox_weight=pt.weight)
        sample = jax.lax.stop_gradient(sample)
        roi_feat = self.extract_rois(pyr, sample["rois"])
        cls_logit, bbox_delta = self.bbox_head(roi_feat)
        losses = bbox_head_loss(cls_logit, bbox_delta, sample["label"],
                                sample["bbox_target"], sample["bbox_weight"])
        losses.update(rpn_losses)
        losses["fit_loss"] = self.kd_head(feats, teacher_label)
        aux = dict(rpn_aux)
        aux["bbox_label"] = sample["label"]
        aux["bbox_cls_logit"] = cls_logit
        return losses, aux


class FitNetRetinaNet(RetinaNet):
    """RetinaNet + hint loss (reference FitNetRetinaNet:45)."""
    kd_head: nn.Module = None

    @nn.compact
    def __call__(self, data, im_info, gt_bbox=None, teacher_label=None,
                 mode="train"):
        pad_hw = data.shape[1:3]
        feats = self.backbone(data)
        pyr = self.neck(feats)
        outs = self.head_module(pyr)
        if mode == "train":
            losses, aux = self.head.loss(outs, gt_bbox, im_info, pad_hw)
            if teacher_label is not None:
                losses["fit_loss"] = self.kd_head(feats, teacher_label)
            return losses, aux
        cls_score, bbox_xyxy, valid = self.head.prediction(outs, im_info,
                                                           pad_hw)
        num_class = self.head.p.num_class
        return {"cls_score": cls_score,
                "bbox_xyxy": jnp.tile(bbox_xyxy, (1, 1, num_class)),
                "det_valid": valid}


def create_teacher_fn(teacher_param, example_data, logger=None):
    """Build the frozen-teacher feature fn from config — the TPU analog of
    create_teacher_module (reference models/KD/utils.py:8, wired in
    detection_train.py:172-181).

    teacher_param fields (nothrow-patched config class):
      backbone  - a DSL Backbone wrapper (its .module is used) or a bare
                  flax module mapping data -> {c2..c5} feature dict; the
                  analog of loading prefix-symbol.json + slicing `endpoint`
      prefix    - checkpoint prefix holding the teacher params (either a
                  full detector tree with a top-level 'backbone' subtree or
                  a bare backbone tree)
      epoch     - checkpoint epoch
      endpoint  - feature key emitted as teacher_label (default 'c4')
    """
    import numpy as np
    import flax

    from simpledet_tpu.core.checkpoint import _params_path

    tp = teacher_param
    module = tp.backbone.module if hasattr(tp.backbone, "module") \
        else tp.backbone
    stage = tp.endpoint or "c4"
    if isinstance(stage, (list, tuple)):
        stage = stage[0]
    params = module.init(jax.random.PRNGKey(0), example_data[:1])["params"]
    if tp.prefix:
        path = _params_path(tp.prefix, tp.epoch or 0)
        with open(path, "rb") as f:
            raw = flax.serialization.msgpack_restore(f.read())
        loaded = flax.traverse_util.flatten_dict(raw)
        flat = flax.traverse_util.flatten_dict(params)
        out, n_hit = {}, 0
        for p_, v in flat.items():
            for cand in (("backbone",) + p_, p_):
                got = loaded.get(cand)
                if got is not None and got.shape == v.shape:
                    out[p_] = np.asarray(got, v.dtype)
                    n_hit += 1
                    break
            else:
                out[p_] = v
        params = flax.traverse_util.unflatten_dict(out)
        if logger:
            logger.info(f"teacher: {n_hit}/{len(flat)} tensors from {path}")
        if n_hit == 0:
            raise ValueError(f"teacher checkpoint {path} matched 0 tensors")
    return make_teacher_fn(module, params, stage=stage)


def make_teacher_fn(teacher_backbone_module, teacher_params, stage="c4"):
    """Jitted frozen-teacher feature extractor: batch data -> teacher_label.

    Replaces the reference's per-batch teacher DetModule forward
    (models/KD/detection_module.py:88-150, wired in detection_train.py:172-181).
    """
    # checkpoint-restored leaves are host numpy; without an explicit
    # device_put every per-batch teacher call re-uploads the whole tree
    # (the TPU tunnel moves ~50 MB/s — seconds per step for a big teacher)
    teacher_params = jax.device_put(teacher_params)

    @jax.jit
    def teacher_fn(data):
        feats = teacher_backbone_module.apply({"params": teacher_params},
                                              data)
        return jax.lax.stop_gradient(feats[stage])

    return teacher_fn
