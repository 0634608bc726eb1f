"""faster_r50v1_fpn_voc07_finetune_1x (reference config/finetune/ +
doc/FINETUNE.md): finetune the COCO flagship checkpoint on VOC07 (21
classes; the class-count-changing head re-initializes via allow_missing)."""
from simpledet_tpu.config_templates import faster_fpn_config


def get_config(is_train):
    cfg = list(faster_fpn_config(is_train, __name__, depth=50, num_class=21))
    DatasetParam, ModelParam, OptimizeParam = cfg[5], cfg[6], cfg[7]
    DatasetParam.image_set = ("voc07_trainval",) if is_train \
        else ("voc07_test",)
    ModelParam.pretrain.prefix = "experiments/faster_r50v1_fpn_1x/checkpoint"
    ModelParam.pretrain.epoch = 6
    n_dev_img = 16
    OptimizeParam.optimizer.lr = OptimizeParam.optimizer.lr / 10
    OptimizeParam.schedule.lr_iter = [7500 * 16 // n_dev_img,
                                      10000 * 16 // n_dev_img]
    OptimizeParam.schedule.iter_per_epoch = 10000 * 16 // n_dev_img // 6
    return tuple(cfg)
