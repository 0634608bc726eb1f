"""INT8 QAT flagship (reference config/int8/faster_r50v1_fpn_int8_1x.py):
the reference rewrote the graph with fake-quant nodes
(utils/graph_optimize.attach_quantize_node, detection_train.py:145-152);
here the train CLI wraps the forward with ops/quant.quantize_apply, which
fake-quants every conv/dense input + kernel with straight-through grads."""
from simpledet_tpu.config_templates import faster_fpn_config


def get_config(is_train):
    out = list(faster_fpn_config(is_train, __name__, depth=50))
    ModelParam = out[6]

    class QuantizeTrainingParam:
        quantize_flag = True
        quantized_op = ("Convolution", "FullyConnected")

        class WeightQuantizeParam:
            power2 = False

        class ActQuantizeParam:
            power2 = False

    ModelParam.quantize_flag = True
    ModelParam.QuantizeTrainingParam = QuantizeTrainingParam
    return tuple(out)
