"""faster_r50v1_fpn_voc07_1x (reference config/finetune/): PASCAL VOC 2007
trainval, 21 classes, from ImageNet pretrain."""
from simpledet_tpu.config_templates import faster_fpn_config


def get_config(is_train):
    cfg = list(faster_fpn_config(is_train, __name__, depth=50, num_class=21))
    DatasetParam, OptimizeParam = cfg[5], cfg[7]
    DatasetParam.image_set = ("voc07_trainval",) if is_train \
        else ("voc07_test",)
    n_dev_img = 16
    OptimizeParam.schedule.lr_iter = [7500 * 16 // n_dev_img,
                                      10000 * 16 // n_dev_img]
    OptimizeParam.schedule.iter_per_epoch = 10000 * 16 // n_dev_img // 6
    return tuple(cfg)
