"""Fully annotated config skeleton (the analog of the reference
doc/fully_annotated_config.py) — every field the framework reads, with the
TPU-specific semantics spelled out.

A config is a python module exporting get_config(is_train) that returns the
13-tuple (General, KvstoreParam, RpnParam, RoiParam, BboxParam,
DatasetParam, ModelParam, OptimizeParam, TestParam, transform, data_name,
label_name, metric_list). Unset fields read as None via
patch_config_as_nothrow. Inputs are padded to fixed shapes — exactly the
static-shape property XLA requires, so every target-assignment step runs
in-graph on device.
"""
from symbol.builder import FasterRcnn as Detector
from models.FPN.builder import MSRAResNet50V1FPN as Backbone
from models.FPN.builder import FPNNeck as Neck
from models.FPN.builder import FPNRpnHead as RpnHead
from models.FPN.builder import FPNRoiAlign as RoiExtractor
from models.FPN.builder import FPNBbox2fcHead as BboxHead
from mxnext.complicate import normalizer_factory


def get_config(is_train):
    class General:
        log_frequency = 10          # Speedometer period (batches)
        name = __name__.rsplit("/")[-1].rsplit(".")[-1]  # experiments/<name>/
        batch_image = 2 if is_train else 1  # images PER DEVICE
        fp16 = False                # True -> bf16 compute (no loss scaling)
        loader_worker = 8           # host transform threads
        profile = False             # jax.profiler trace of batches 1-10
        summary = False             # scalar summaries -> events.jsonl
        checkpoint_iter = None      # e.g. 5000 -> extra ckpt every N iters

    class KvstoreParam:
        kvstore = "mesh"            # gradients allreduce over the jax Mesh
        batch_image = General.batch_image
        gpus = list(range(8))       # device count used for LR scaling math
        fp16 = General.fp16

    class NormalizeParam:
        # fixbn: frozen scale/bias (pretrained); syncbn: global batch stats
        # (cross-device under pjit); gn: GroupNorm; dummy: identity
        normalizer = normalizer_factory(type="fixbn")

    class BackboneParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        depth = 50                  # hybrid builders also read num_cX_block

    class NeckParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer

    class RpnParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        batch_image = General.batch_image

        class anchor_generate:      # constant grid folded into the graph
            scale = (8,)            # sqrt(area)/stride units
            ratio = (0.5, 1.0, 2.0)
            stride = (4, 8, 16, 32, 64)   # one entry per pyramid level
            image_anchor = 256      # sampled anchors per image

        class anchor_assign:        # on-device AnchorTarget (no host work)
            allowed_border = 0      # anchors beyond border+this are ignored
            pos_thr = 0.7           # IoU >= -> positive
            neg_thr = 0.3           # IoU <  -> negative
            min_pos_thr = 0.0       # per-gt best anchor gate
            image_anchor = 256
            pos_fraction = 0.5

        class head:
            conv_channel = 256
            mean = (0, 0, 0, 0)     # proposal decode normalization
            std = (1, 1, 1, 1)

        class proposal:             # device NMS (Pallas kernel on TPU)
            pre_nms_top_n = 2000 if is_train else 1000   # per level
            post_nms_top_n = 2000 if is_train else 1000  # cross-level top-k
            nms_thr = 0.7
            min_bbox_side = 0

        class subsample_proposal:   # on-device ProposalTarget
            proposal_wo_gt = False  # False appends gt boxes to proposals
            image_roi = 512         # static sampled roi count
            fg_fraction = 0.25
            fg_thr = 0.5
            bg_thr_hi = 0.5
            bg_thr_lo = 0.0

        class bbox_target:
            num_reg_class = 81      # 2 when class_agnostic
            class_agnostic = False
            weight = (1.0, 1.0, 1.0, 1.0)
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

    class BboxParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        num_class = 1 + 80          # incl. background
        image_roi = 512
        batch_image = General.batch_image

        class regress_target:
            class_agnostic = False
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

    class RoiParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        out_size = 7
        stride = (4, 8, 16, 32)     # levels RoIAlign gathers from
        roi_canonical_scale = 224   # FPN level-assignment rule
        roi_canonical_level = 4

    class DatasetParam:
        image_set = ("coco_train2017",) if is_train else ("coco_val2017",)
        cache_dir = "data/cache"    # <set>.roidb pickles live here

    backbone = Backbone(BackboneParam)
    neck = Neck(NeckParam)
    rpn_head = RpnHead(RpnParam)
    roi_extractor = RoiExtractor(RoiParam)
    bbox_head = BboxHead(BboxParam)
    detector = Detector()
    if is_train:
        train_sym = detector.get_train_symbol(
            backbone, neck, rpn_head, roi_extractor, bbox_head)
        test_sym = None
        rpn_test_sym = None
    else:
        train_sym = None
        test_sym = detector.get_test_symbol(
            backbone, neck, rpn_head, roi_extractor, bbox_head)
        rpn_test_sym = detector.get_rpn_test_symbol(backbone, neck, rpn_head)

    class ModelParam:
        train_symbol = train_sym    # a jittable Flax module, not mx.sym
        test_symbol = test_sym
        rpn_test_symbol = rpn_test_sym
        from_scratch = False
        random = True               # time-seeded init rng
        memonger = False            # True -> jax.checkpoint rematerialization
        memonger_until = "stage3"   # kept for schema compat

        class pretrain:
            prefix = "pretrain_model/resnet-v1-50"
            epoch = 0
            fixed_param = ["conv0", "stage1", "scale", "bias"]  # substrings
            excluded_param = None   # overrides fixed_param matches

    class OptimizeParam:
        class optimizer:
            type = "sgd"
            # linear-scaling rule against the global batch
            lr = 0.01 / 8 * len(KvstoreParam.gpus) * KvstoreParam.batch_image
            momentum = 0.9
            wd = 0.0001
            clip_gradient = None

        class schedule:
            begin_epoch = 0         # >0 resumes from checkpoint-%04d
            end_epoch = 6
            lr_iter = [60000 * 16 // 16, 80000 * 16 // 16]  # decay steps
            iter_per_epoch = 90000 // 6

        class warmup:
            type = "gradual"        # or "constant"
            lr = 0.02 / 3.0
            iter = 500

    class TestParam:
        min_det_score = 0.05
        max_det_per_image = 100
        scales = None               # [(short, long), ...] multi-scale test
        flip = False                # flip TTA, aggregated before NMS
        process_roidb = lambda x: x      # noqa: E731  hooks preserved
        process_output = lambda x, y: x  # noqa: E731

        class model:
            prefix = "experiments/{}/checkpoint".format(General.name)
            epoch = OptimizeParam.schedule.end_epoch

        class nms:
            type = "nms"            # nms | softnms | setnms
            thr = 0.5

        class coco:
            annotation = "data/coco/annotations/instances_val2017.json"

    from simpledet_tpu.config_templates import standard_transforms
    transform, data_name, label_name = standard_transforms(is_train)

    import core.detection_metric as metric
    metric_list = [
        metric.AccWithIgnore("RpnAcc", ["rpn_cls_logit", "rpn_label"], []),
        metric.AccWithIgnore("RcnnAcc", ["bbox_cls_logit", "bbox_label"], []),
    ]

    return General, KvstoreParam, RpnParam, RoiParam, BboxParam, \
        DatasetParam, ModelParam, OptimizeParam, TestParam, \
        transform, data_name, label_name, metric_list
