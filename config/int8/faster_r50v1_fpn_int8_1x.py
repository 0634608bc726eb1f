"""INT8 QAT flagship (reference config/int8/): the reference rewrote the
graph with fake-quant nodes (utils/graph_optimize.attach_quantize_node);
here QAT layers live in ops/quant.py (QuantConv/QuantDense with
straight-through fake-quant). This config trains the standard flagship —
swap heads to the Quant layers per-module where QAT is wanted; the fake
quant op itself is exercised in tests/test_aux2.py."""
from simpledet_tpu.config_templates import faster_fpn_config


def get_config(is_train):
    out = list(faster_fpn_config(is_train, __name__, depth=50))
    ModelParam = out[6]
    ModelParam.quantize_flag = True   # consumed by QAT-aware heads
    return tuple(out)
