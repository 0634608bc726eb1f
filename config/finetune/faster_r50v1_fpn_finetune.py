"""Finetune recipe (reference config/finetune/ + doc/FINETUNE.md): start
from a trained checkpoint, freeze the backbone, short 1-epoch schedule."""
from simpledet_tpu.config_templates import faster_fpn_config


def get_config(is_train):
    cfg = list(faster_fpn_config(is_train, __name__, depth=50))
    ModelParam, OptimizeParam = cfg[6], cfg[7]
    ModelParam.pretrain.prefix = "experiments/faster_r50v1_fpn_1x/checkpoint"
    ModelParam.pretrain.epoch = 6
    ModelParam.pretrain.fixed_param = ["backbone"]
    OptimizeParam.schedule.end_epoch = 1
    OptimizeParam.optimizer.lr = OptimizeParam.optimizer.lr / 10
    return tuple(cfg)
