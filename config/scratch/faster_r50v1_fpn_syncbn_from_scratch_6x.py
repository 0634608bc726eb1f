"""Train-from-scratch recipe (reference config/scratch/): no pretrain,
SyncBN everywhere, nothing frozen, long schedule."""
from simpledet_tpu.config_templates import faster_fpn_config


def get_config(is_train):
    cfg = list(faster_fpn_config(is_train, __name__, depth=50,
                                 schedule_mult=6, norm_type="syncbn"))
    ModelParam = cfg[6]
    ModelParam.from_scratch = True
    ModelParam.pretrain.fixed_param = []
    return tuple(cfg)
