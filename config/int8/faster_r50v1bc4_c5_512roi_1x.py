"""faster_r50v1bc4_c5_512roi_1x (reference config/int8/): INT8 QAT on the
v1b C4 Faster R-CNN; the train CLI wraps the forward with
ops/quant.quantize_apply (the analog of attach_quantize_node)."""
from simpledet_tpu.config_templates import trident_c4_config


def get_config(is_train):
    out = list(trident_c4_config(is_train, __name__, depth=50,
                                 resnet_variant="v1b", num_branch=1,
                                 scaleaware=False, image_roi=512,
                                 batch_image=2))
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
