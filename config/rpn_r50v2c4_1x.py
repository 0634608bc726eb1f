"""rpn_r50v2c4_1x (reference config/rpn_r50v2c4_1x.py): RPN-only proposal
model on the single-branch ResNet-50-v2 C4 backbone."""
from simpledet_tpu.config_templates import trident_c4_config


def get_config(is_train):
    from models.tridentnet.builder import TridentRpnHead
    from models.tridentnet.builder_v2 import TridentResNetV2C4
    from symbol.builder import RPN, Neck

    cfg = list(trident_c4_config(is_train, __name__, depth=50,
                                 resnet_variant="v2", num_branch=1,
                                 scaleaware=False, image_roi=256,
                                 batch_image=2))
    General, RpnParam, ModelParam = cfg[0], cfg[2], cfg[6]

    class _B:
        fp16 = General.fp16
        normalizer = RpnParam.normalizer
        depth = 50

        class trident:
            num_branch = 1
            branch_dilates = [1]

    det = RPN()
    bb = TridentResNetV2C4(_B)
    nk = Neck(_B)
    rh = TridentRpnHead(RpnParam)
    if is_train:
        ModelParam.train_symbol = det.get_train_symbol(bb, nk, rh)
    else:
        ModelParam.test_symbol = det.get_rpn_test_symbol(bb, nk, rh)
        ModelParam.rpn_test_symbol = ModelParam.test_symbol
    import core.detection_metric as metric
    cfg[12] = [metric.AccWithIgnore("RpnAcc", ["rpn_cls_logit", "rpn_label"],
                                    [])]
    return tuple(cfg)
