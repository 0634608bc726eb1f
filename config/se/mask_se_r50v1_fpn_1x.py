"""Mask R-CNN with the SE mask head (reference config/se/)."""
import importlib.util
import os


def get_config(is_train):
    spec = importlib.util.spec_from_file_location(
        "mask_base", os.path.join(os.path.dirname(os.path.dirname(__file__)),
                                  "mask_r50v1_fpn_1x.py"))
    base = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(base)
    cfg = list(base.get_config(is_train))
    General, RpnParam, BboxParam, ModelParam, TestParam = (
        cfg[0], cfg[2], cfg[4], cfg[6], cfg[8])
    General.name = "mask_se_r50v1_fpn_1x"
    TestParam.model.prefix = "experiments/mask_se_r50v1_fpn_1x/checkpoint"

    import models.maskrcnn.builder as M
    from models.se.builder import MaskRcnnSe4convHead
    from mxnext.complicate import normalizer_factory

    class NormalizeParam:
        normalizer = normalizer_factory(type="fixbn")

    class P:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer

    class MaskParam(P):
        resolution = 28
        dim_reduced = 256
        num_fg_roi = 128

    class RoiParam(P):
        out_size = 7
        stride = (4, 8, 16, 32)
        roi_canonical_scale = 224
        roi_canonical_level = 4

    class MaskRoiParam(RoiParam):
        out_size = 14

    bb = M.MSRAResNet50V1FPN(P)
    nk = M.FPNNeck(P)
    rh = M.MaskFPNRpnHead(RpnParam, MaskParam)
    re = M.FPNRoiAlign(RoiParam)
    mre = M.FPNRoiAlign(MaskRoiParam)
    bh = M.FPNBbox2fcHead(BboxParam)
    mh = MaskRcnnSe4convHead(BboxParam, MaskParam, MaskRoiParam)
    pp = M.BboxPostProcessor(TestParam)
    det = M.MaskFasterRcnn()
    if is_train:
        ModelParam.train_symbol = det.get_train_symbol(bb, nk, rh, re, mre,
                                                       bh, mh)
    else:
        ModelParam.test_symbol = det.get_test_symbol(bb, nk, rh, re, mre,
                                                     bh, mh, pp)
    return tuple(cfg)
