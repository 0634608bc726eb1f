"""doublepred_r50v1b_fpn_1x (reference config/crowdhuman/): EMD double-
prediction Faster R-CNN on CrowdHuman, v1b backbone, set-NMS at test."""
from simpledet_tpu.config_templates import faster_fpn_config


def get_config(is_train):
    from models.crowdhuman.builder import (DoublePredFPNBbox2fcHead,
                                           DoublePredRcnn)
    cfg = list(faster_fpn_config(
        is_train, __name__, depth=50, variant="v1b", num_class=2,
        bbox_head=DoublePredFPNBbox2fcHead, detector=DoublePredRcnn))
    RpnParam, BboxParam, DatasetParam, TestParam = (cfg[2], cfg[4], cfg[5],
                                                    cfg[8])
    RpnParam.bbox_target.num_reg_class = 2
    RpnParam.bbox_target.class_agnostic = True
    BboxParam.regress_target.class_agnostic = True
    TestParam.nms.type = "setnms"
    DatasetParam.image_set = ("crowdhuman_train",) if is_train \
        else ("crowdhuman_val",)
    import core.detection_metric as metric
    cfg[12] = [metric.ScalarLoss("EMD", ["emd_loss"], [])]
    return tuple(cfg)
