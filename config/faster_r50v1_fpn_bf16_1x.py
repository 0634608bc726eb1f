"""faster_r50v1_fpn_bf16_1x — mixed-precision flagship. The reference's fp16
configs (config/faster_r50v1c4_c5_512roi_1x_fp16.py) map to bf16 on TPU: no
loss scaling needed, fp32 islands kept at heads/RoI boundaries."""
from simpledet_tpu.config_templates import faster_fpn_config


def get_config(is_train):
    return faster_fpn_config(is_train, __name__, depth=50, fp16=True)
