"""FreeAnchor convergence-proof config (tests/test_converge_freeanchor.py).

Overfits the shared 16-image synthetic set from scratch until train-set
box AP >= 0.6 through train -> checkpoint -> detection_test — learning
proof for the learning-to-match family (VERDICT r4 Weak #3; reference
models/FreeAnchor/ops.py positive/negative bag losses,
config/FreeAnchor/free_anchor_r50v1_fpn_1x.py). Gates the bag
construction (pre_anchor_top_n candidates per gt), the mean-max positive
loss and the matched-probability negative loss — none of which a
finite-loss test can validate. Env prefix: CONVERGE_FREEANCHOR_*.
"""
from models.retinanet.builder import RetinaNet as Detector
from models.retinanet.builder import MSRAResNet50V1FPN
from models.retinanet.builder import RetinaNetNeck as Neck
from models.FreeAnchor.builder import FreeAnchorRetinaNetHead as RpnHead
from mxnext.complicate import normalizer_factory

from config import converge_common as cc

PREFIX = "CONVERGE_FREEANCHOR"


class TinyBackbone(MSRAResNet50V1FPN):
    depth = 18


def get_config(is_train):
    General = cc.make_general("converge_freeanchor", PREFIX)
    KvstoreParam = cc.make_kvstore(General)

    class NormalizeParam:
        normalizer = normalizer_factory(type="syncbn")

    class BackboneParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer

    class NeckParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer

    class RpnParam:
        num_class = 1 + 3
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        batch_image = General.batch_image

        class anchor_generate:
            scale = (2, 2 ** (1.0 / 2.0) * 2)
            ratio = (0.5, 1.0, 2.0)
            stride = (8, 16, 32, 64, 128)
            image_anchor = None

        class anchor_assign:
            allowed_border = 9999
            pos_thr = 0.5
            neg_thr = 0.4
            min_pos_thr = 0.0
            # FreeAnchor extras (reference config bbox_thr/pre_anchor_top_n)
            bbox_thr = 0.6
            pre_anchor_top_n = 16

        class head:
            conv_channel = 64
            mean = (0.0, 0.0, 0.0, 0.0)
            std = (0.1, 0.1, 0.2, 0.2)

        class proposal:
            pre_nms_top_n = 100
            min_det_score = 0.02

        class focal_loss:
            alpha = 0.5
            gamma = 2.0

    class BboxParam:
        pass

    class RoiParam:
        pass

    DatasetParam = cc.make_dataset(is_train)
    OptimizeParam = cc.make_optimize(PREFIX, lr="0.0005", epochs="160",
                                     warmup="60", lr_iter="480,560",
                                     wd=0.00001, opt_type="adam")
    TestParam = cc.make_test_param("converge_freeanchor", PREFIX,
                                   OptimizeParam, min_det_score=0.05)

    backbone = TinyBackbone(BackboneParam)
    neck = Neck(NeckParam)
    rpn_head = RpnHead(RpnParam)
    detector = Detector()
    if is_train:
        train_sym = detector.get_train_symbol(backbone, neck, rpn_head)
        test_sym = None
    else:
        train_sym = None
        test_sym = detector.get_test_symbol(backbone, neck, rpn_head)

    class ModelParam:
        train_symbol = train_sym
        test_symbol = test_sym
        rpn_test_symbol = None
        from_scratch = True
        random = False

        class pretrain:
            prefix = "nonexistent"
            epoch = 0
            fixed_param = []

    transform, data_name, label_name = cc.make_transforms(is_train)

    import core.detection_metric as metric
    metric_list = [
        metric.ScalarLoss("PosLoss", ["freeanchor_positive_loss"], []),
        metric.ScalarLoss("NegLoss", ["freeanchor_negative_loss"], []),
    ]
    return (General, KvstoreParam, RpnParam, RoiParam, BboxParam,
            DatasetParam, ModelParam, OptimizeParam, TestParam, transform,
            data_name, label_name, metric_list)
