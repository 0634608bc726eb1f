"""faster_r50v1b_pafpn3@256_syncbn_1x (reference config/FPG group)."""
from simpledet_tpu.config_templates import faster_fpn_config
from simpledet_tpu.dsl import PAFPNNeck


def get_config(is_train):
    return faster_fpn_config(
        is_train, __name__, depth=50, variant="v1b", neck=PAFPNNeck,
        neck_attrs={"dim_reduced": 256, "num_stage": 3})
