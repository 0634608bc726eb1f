"""retina_r50v1b_fpn_1x (reference config/sepc/retina_r50v1b_fpn_1x.py):
the SEPC group's plain-FPN baseline."""
from simpledet_tpu.config_templates import retina_fpn_config


def get_config(is_train):
    from models.retinanet.builder import RetinaNetHeadWithBN
    return retina_fpn_config(is_train, __name__, depth=50, variant="v1b",
                             head=RetinaNetHeadWithBN)
