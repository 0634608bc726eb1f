"""Shared scaffolding for the per-family convergence-proof configs.

config/converge_test.py proved the Faster R-CNN family LEARNS (train-set
AP >= 0.6 from scratch on a 16-image synthetic set). Round 4 extends that
gate to Mask/Retina/Cascade/FCOS — the reference's MODEL_ZOO rows are its
de-facto regression suite (/root/reference/MODEL_ZOO.md:100-102), and a
finite-loss e2e cannot catch a mis-wired mask target, focal-loss
normalization, or cascade-stage resampling bug; an overfit-AP gate can.

Every family shares the same synthetic dataset, image geometry, optimizer
schedule shape and env-override scheme (<PREFIX>_EPOCHS / _LR / _BATCH /
_WARMUP / _LR_ITER), tuned per family in the config defaults.
"""
import os


def data_root():
    """Read the env at call time (not import time): different family tests
    in one pytest session may point CONVERGE_DATA_ROOT at different roots
    while this module stays cached in sys.modules."""
    return os.environ.get("CONVERGE_DATA_ROOT", "/tmp/simpledet_converge")


def env(prefix, key, default):
    return os.environ.get(f"{prefix}_{key}", default)


def make_general(name, prefix, log_frequency=20):
    class General:
        pass
    General.log_frequency = log_frequency
    General.name = name
    # global batch 8 on the 8-device test mesh; <PREFIX>_BATCH=8 gives the
    # same global batch on one real chip (hyperparameter tuning)
    General.batch_image = int(env(prefix, "BATCH", "1"))
    General.fp16 = False
    General.loader_worker = 2
    General.checkpoint_period = 1000   # keep only the final epoch's ckpt
    return General


def make_kvstore(General):
    class KvstoreParam:
        pass
    KvstoreParam.kvstore = "mesh"
    KvstoreParam.batch_image = General.batch_image
    KvstoreParam.gpus = [0]
    KvstoreParam.fp16 = General.fp16
    return KvstoreParam


def make_dataset(is_train):
    class DatasetParam:
        pass
    DatasetParam.image_set = ("converge_train",)
    DatasetParam.cache_dir = os.path.join(data_root(), "cache")
    return DatasetParam


def make_optimize(prefix, lr="0.005", epochs="120", warmup="60",
                  lr_iter="320,400", wd=0.00005, opt_type="sgd"):
    lr_v = float(env(prefix, "LR", lr))

    class OptimizeParam:
        class optimizer:
            momentum = 0.9
            clip_gradient = 35

        class schedule:
            begin_epoch = 0
            iter_per_epoch = None   # derived from loader (4/epoch)

        class warmup:
            type = "gradual"

    OptimizeParam.optimizer.type = env(prefix, "OPT", opt_type)
    OptimizeParam.optimizer.lr = lr_v
    OptimizeParam.optimizer.wd = wd
    OptimizeParam.schedule.end_epoch = int(env(prefix, "EPOCHS", epochs))
    OptimizeParam.schedule.lr_iter = [
        int(v) for v in env(prefix, "LR_ITER", lr_iter).split(",")]
    OptimizeParam.warmup.lr = lr_v * 0.1
    OptimizeParam.warmup.iter = int(env(prefix, "WARMUP", warmup))
    return OptimizeParam


def make_test_param(name, prefix, OptimizeParam, nms_thr=0.5,
                    min_det_score=0.05, max_det=20):
    class TestParam:
        pass
    TestParam.min_det_score = min_det_score
    TestParam.max_det_per_image = max_det
    TestParam.process_roidb = lambda x: x
    TestParam.process_output = lambda x, y: x

    class model:
        pass
    model.prefix = f"experiments/{name}/checkpoint"
    model.epoch = OptimizeParam.schedule.end_epoch
    TestParam.model = model

    class nms:
        pass
    nms.type = "nms"
    nms.thr = nms_thr
    TestParam.nms = nms

    class coco:
        pass
    coco.annotation = os.path.join(data_root(), "annotations.json")
    TestParam.coco = coco
    return TestParam


class NormParam:
    mean = (122.7717, 115.9465, 102.9801)
    std = (1.0, 1.0, 1.0)


class ResizeParam:
    short = 128
    long = 192


class PadParam:
    short = 128
    long = 192
    max_num_gt = 10
    max_len_gt_poly = 100


class RenameParam:
    mapping = dict(image="data")


def make_transforms(is_train):
    """Standard bbox-only chain (mask config builds its own poly chain)."""
    from core.detection_input import (
        ReadRoiRecord, Norm2DImage, Resize2DImageBbox, Flip2DImageBbox,
        Pad2DImageBbox, RenameRecord)
    if is_train:
        transform = [
            ReadRoiRecord(None),
            Norm2DImage(NormParam),
            Resize2DImageBbox(ResizeParam),
            Flip2DImageBbox(),
            Pad2DImageBbox(PadParam),
            RenameRecord(RenameParam.mapping),
        ]
        data_name = ["data"]
        label_name = ["gt_bbox", "im_info"]
    else:
        transform = [
            ReadRoiRecord(None),
            Norm2DImage(NormParam),
            Resize2DImageBbox(ResizeParam),
            Pad2DImageBbox(PadParam),
            RenameRecord(RenameParam.mapping),
        ]
        data_name = ["data", "im_info", "im_id", "rec_id"]
        label_name = []
    return transform, data_name, label_name
