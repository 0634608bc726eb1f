"""RetinaNet + EfficientNet-B4 (reference config/efficientnet/)."""
from simpledet_tpu.config_templates import retina_fpn_config


def get_config(is_train):
    import models.retinanet.builder as retina_builder
    from models.efficientnet.builder import EfficientNetB4FPN
    # monkey-free: pass backbone via the template's depth hook by
    # substituting the builder attribute lookup
    out = retina_fpn_config.__wrapped__ if hasattr(
        retina_fpn_config, "__wrapped__") else None
    # simplest: call template then rebuild symbols with the effnet backbone
    from simpledet_tpu.config_templates import retina_fpn_config as tpl
    cfg = list(tpl(is_train, __name__, depth=50))
    (General, KvstoreParam, RpnParam) = cfg[0], cfg[1], cfg[2]
    bb = EfficientNetB4FPN(type("B", (), {"fp16": General.fp16,
                                          "normalizer": None}))
    nk = retina_builder.RetinaNetNeck(type("N", (), {
        "fp16": General.fp16, "normalizer": None}))
    hd = retina_builder.RetinaNetHead(RpnParam)
    det = retina_builder.RetinaNet()
    ModelParam = cfg[6]
    if is_train:
        ModelParam.train_symbol = det.get_train_symbol(bb, nk, hd)
    else:
        ModelParam.test_symbol = det.get_test_symbol(bb, nk, hd)
    ModelParam.pretrain.prefix = "pretrain_model/efficientnet-b4"
    return tuple(cfg)
