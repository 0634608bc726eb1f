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
    # No pretrained backbone exists in this environment, so the curve must
    # train FROM SCRATCH — which requires live normalization: FrozenBN's
    # random affine compounds over 50 layers and diverges within 2 steps
    # (first attempt: step0 total_loss 24.7, step2 1e20). SyncBN + nothing
    # frozen mirrors the reference's from-scratch recipes (config/scratch/).
    (General, KvstoreParam, RpnParam, RoiParam, BboxParam, DatasetParam,
     ModelParam, OptimizeParam, TestParam, transform, data_name, label_name,
     metric_list) = faster_fpn_config(is_train, __name__, depth=50, fp16=True,
                                      norm_type="syncbn")
    ModelParam.from_scratch = True
    ModelParam.pretrain.fixed_param = []

    General.checkpoint_period = 1000   # keep only the final checkpoint
    General.log_frequency = 20

    # linear-scaling rule: the template's lr 0.02 is for global batch 16
    # (8 dev x 2); this run is ONE chip x batch 2 -> lr/8, short warmup
    OptimizeParam.optimizer.lr = float(
        os.environ.get("FLAGSHIP_CURVE_LR", "0.0025"))
    OptimizeParam.warmup.lr = OptimizeParam.optimizer.lr / 3
    OptimizeParam.warmup.iter = int(
        os.environ.get("FLAGSHIP_CURVE_WARMUP", "100"))

    DatasetParam.image_set = ("flagship_synth",)
    DatasetParam.cache_dir = os.path.join(DATA_ROOT, "cache")

    OptimizeParam.schedule.end_epoch = int(
        os.environ.get("FLAGSHIP_CURVE_EPOCHS", "10"))
    OptimizeParam.schedule.iter_per_epoch = None     # derive from loader
    OptimizeParam.schedule.lr_iter = [int(v) for v in os.environ.get(
        "FLAGSHIP_CURVE_LR_ITER", "100000").split(",")]

    TestParam.model.prefix = "experiments/config_flagship_synth_curve/checkpoint"
    TestParam.model.epoch = OptimizeParam.schedule.end_epoch

    class coco:
        annotation = os.path.join(DATA_ROOT, "annotations.json")
    TestParam.coco = coco

    return (General, KvstoreParam, RpnParam, RoiParam, BboxParam,
            DatasetParam, ModelParam, OptimizeParam, TestParam, transform,
            data_name, label_name, metric_list)
