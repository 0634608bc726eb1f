"""efficientnet_b5_fpn_bn_scratch_400_12x (reference config/efficientnet/efficientnet_b5_fpn_bn_scratch_400_12x.py): RetinaNet + EfficientNet-B5
FPN, 400px inputs, sync-BN, trained from scratch, 12x6-epoch schedule."""
from simpledet_tpu.config_templates import (retina_fpn_config,
                                            standard_transforms)


def get_config(is_train):
    import models.retinanet.builder as retina_builder
    from models.efficientnet.builder import EfficientNetB5FPN
    from mxnext.complicate import normalizer_factory

    cfg = list(retina_fpn_config(is_train, __name__, depth=50,
                                 schedule_mult=12))
    General, RpnParam, ModelParam, OptimizeParam = (cfg[0], cfg[2], cfg[6],
                                                    cfg[7])

    class _B:
        fp16 = General.fp16
        normalizer = normalizer_factory(type="syncbn", ndev=8)

    bb = EfficientNetB5FPN(_B)
    nk = retina_builder.RetinaNetNeckWithBN(_B)
    hd = retina_builder.RetinaNetHead(RpnParam)
    det = retina_builder.RetinaNet()
    if is_train:
        ModelParam.train_symbol = det.get_train_symbol(bb, nk, hd)
    else:
        ModelParam.test_symbol = det.get_test_symbol(bb, nk, hd)
    ModelParam.from_scratch = True
    ModelParam.pretrain.fixed_param = []
    cfg[9], cfg[10], cfg[11] = standard_transforms(is_train, short=400,
                                                   long=666)
    return tuple(cfg)
