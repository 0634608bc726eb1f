"""faster_r50v1b_fpg6@128_syncbn_1x (reference config/FPG group)."""
from simpledet_tpu.config_templates import faster_fpn_config
from simpledet_tpu.dsl import FPGNeckP2P6


def get_config(is_train):
    return faster_fpn_config(
        is_train, __name__, depth=50, variant="v1b", neck=FPGNeckP2P6,
        neck_attrs={"dim_reduced": 128, "num_stage": 6})
