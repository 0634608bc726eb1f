"""Flagship (Faster R-CNN R50-FPN bf16) on a synthetic COCO-shaped dataset,
for the committed loss-curve artifact (tools/train_flagship_curve.py runs
this on the real TPU chip; experiments/converge_curve.md records results).

Same model/schedule machinery as faster_r50v1_fpn_bf16_1x; only the data
source and run length differ.
"""
import os

from simpledet_tpu.config_templates import faster_fpn_config

DATA_ROOT = os.environ.get("FLAGSHIP_SYNTH_ROOT", "/tmp/simpledet_flagship_synth")


def get_config(is_train):
    (General, KvstoreParam, RpnParam, RoiParam, BboxParam, DatasetParam,
     ModelParam, OptimizeParam, TestParam, transform, data_name, label_name,
     metric_list) = faster_fpn_config(is_train, __name__, depth=50, fp16=True)

    General.checkpoint_period = 1000   # keep only the final checkpoint
    General.log_frequency = 20

    DatasetParam.image_set = ("flagship_synth",)
    DatasetParam.cache_dir = os.path.join(DATA_ROOT, "cache")

    OptimizeParam.schedule.end_epoch = int(
        os.environ.get("FLAGSHIP_CURVE_EPOCHS", "10"))
    OptimizeParam.schedule.iter_per_epoch = None     # derive from loader
    OptimizeParam.schedule.lr_iter = [int(v) for v in os.environ.get(
        "FLAGSHIP_CURVE_LR_ITER", "100000").split(",")]

    TestParam.model.prefix = "experiments/flagship_synth_curve/checkpoint"
    TestParam.model.epoch = OptimizeParam.schedule.end_epoch

    class coco:
        annotation = os.path.join(DATA_ROOT, "annotations.json")
    TestParam.coco = coco

    return (General, KvstoreParam, RpnParam, RoiParam, BboxParam,
            DatasetParam, ModelParam, OptimizeParam, TestParam, transform,
            data_name, label_name, metric_list)
