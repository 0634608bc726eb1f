"""Micro INT8 QAT config for CPU e2e tests: the micro flagship with the
train CLI's quantize_apply wrapping (fake-quant conv/dense io + kernels,
reference detection_train.py:145-152)."""
import config.micro_test as base


def get_config(is_train):
    cfg = list(base.get_config(is_train))
    General, ModelParam = cfg[0], cfg[6]

    class QGeneral(General):
        name = "int8_micro_test"
    cfg[0] = QGeneral

    ModelParam.quantize_flag = True
    return tuple(cfg)
