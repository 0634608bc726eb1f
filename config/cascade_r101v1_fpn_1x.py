"""cascade_r101v1_fpn_1x (reference config/cascade_r101v1_fpn_1x.py): the
cascade flagship with the R101-v1 backbone."""
import importlib.util
import os


def get_config(is_train):
    spec = importlib.util.spec_from_file_location(
        "cascade_base", os.path.join(os.path.dirname(__file__),
                                     "cascade_r50v1_fpn_1x.py"))
    base = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(base)
    from models.FPN.builder import MSRAResNet101V1FPN
    base.Backbone = MSRAResNet101V1FPN
    cfg = list(base.get_config(is_train))
    General, ModelParam, TestParam = cfg[0], cfg[6], cfg[8]
    General.name = "cascade_r101v1_fpn_1x"
    ModelParam.pretrain.prefix = "pretrain_model/resnet-v1-101"
    TestParam.model.prefix = "experiments/cascade_r101v1_fpn_1x/checkpoint"
    cfg[2].depth = 101
    return tuple(cfg)
