"""tsd_r50_rpn_1x (the reference's TSD experiment name,
config/TSD/tsd_r50_rpn_1x.py) — same assembly as tsd_r50v1_fpn_1x."""
import importlib.util
import os


def get_config(is_train):
    spec = importlib.util.spec_from_file_location(
        "tsd_base", os.path.join(os.path.dirname(__file__),
                                 "tsd_r50v1_fpn_1x.py"))
    base = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(base)
    cfg = list(base.get_config(is_train))
    cfg[0].name = "tsd_r50_rpn_1x"
    cfg[8].model.prefix = "experiments/tsd_r50_rpn_1x/checkpoint"
    return tuple(cfg)
