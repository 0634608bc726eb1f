"""free_anchor_r101v1_fpn_1x (reference config/FreeAnchor/)."""
from simpledet_tpu.config_templates import retina_fpn_config


def get_config(is_train):
    from models.FreeAnchor.builder import FreeAnchorRetinaNetHead
    out = list(retina_fpn_config(is_train, __name__, depth=101,
                                 head=FreeAnchorRetinaNetHead))
    RpnParam = out[2]
    RpnParam.anchor_assign.bbox_thr = 0.6
    RpnParam.anchor_assign.pre_anchor_top_n = 50
    RpnParam.head.mean = (0., 0., 0., 0.)
    RpnParam.head.std = (0.1, 0.1, 0.2, 0.2)
    RpnParam.focal_loss.alpha = 0.5
    import core.detection_metric as metric
    out[12] = [metric.ScalarLoss("PosLoss", ["freeanchor_positive_loss"], []),
               metric.ScalarLoss("NegLoss", ["freeanchor_negative_loss"], [])]
    return tuple(out)
