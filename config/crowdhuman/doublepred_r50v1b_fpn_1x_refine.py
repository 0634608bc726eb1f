"""doublepred_r50v1b_fpn_1x_refine (reference config/crowdhuman/): EMD
double-prediction with the refine module — first-round predictions tiled
(repeat_time=4) onto the trunk feature, shared fc3, second EMD loss."""
from simpledet_tpu.config_templates import faster_fpn_config


def get_config(is_train):
    from models.crowdhuman.builder import (DoublePredFPNBbox2fcHead,
                                           DoublePredRcnn)
    def bbox_head(pBbox):
        pBbox.refine_mode = True
        pBbox.repeat_time = 4
        return DoublePredFPNBbox2fcHead(pBbox)

    cfg = list(faster_fpn_config(
        is_train, __name__, depth=50, variant="v1b", num_class=2,
        bbox_head=bbox_head, detector=DoublePredRcnn))
    RpnParam, BboxParam, DatasetParam, TestParam = (cfg[2], cfg[4], cfg[5],
                                                    cfg[8])
    RpnParam.bbox_target.num_reg_class = 2
    RpnParam.bbox_target.class_agnostic = True
    BboxParam.regress_target.class_agnostic = True
    TestParam.nms.type = "setnms"
    DatasetParam.image_set = ("crowdhuman_train",) if is_train \
        else ("crowdhuman_val",)
    import core.detection_metric as metric
    cfg[12] = [metric.ScalarLoss("EMD", ["emd_loss"], []),
               metric.ScalarLoss("RefineEMD", ["refine_emd_loss"], [])]
    return tuple(cfg)
