"""ms_r50v1_fpn_1x — Mask Scoring R-CNN (reference config/ms_r50v1_fpn_1x.py):
the mask config with the MaskIoU head."""
import importlib.util
import os


def get_config(is_train):
    spec = importlib.util.spec_from_file_location(
        "mask_base", os.path.join(os.path.dirname(__file__),
                                  "mask_r50v1_fpn_1x.py"))
    base = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(base)
    # rebuild with the mask-scoring detector + maskiou head
    import models.msrcnn.builder as M
    cfg = list(base.get_config(is_train))
    General, KvstoreParam, RpnParam = cfg[0], cfg[1], cfg[2]
    BboxParam, ModelParam, TestParam = cfg[4], cfg[6], cfg[8]
    General.name = "ms_r50v1_fpn_1x"
    TestParam.model.prefix = "experiments/ms_r50v1_fpn_1x/checkpoint"

    class NormalizeParam:
        from mxnext.complicate import normalizer_factory
        normalizer = normalizer_factory(type="fixbn")

    class BackboneParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer

    class NeckParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer

    class MaskParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        resolution = 28
        dim_reduced = 256
        num_fg_roi = int(RpnParam.subsample_proposal.image_roi *
                         RpnParam.subsample_proposal.fg_fraction)

    class RoiParam:
        fp16 = General.fp16
        normalizer = NormalizeParam.normalizer
        out_size = 7
        stride = (4, 8, 16, 32)
        roi_canonical_scale = 224
        roi_canonical_level = 4

    class MaskRoiParam(RoiParam):
        out_size = 14

    bb = M.MSRAResNet50V1FPN(BackboneParam)
    nk = M.FPNNeck(NeckParam)
    rh = M.MaskFPNRpnHead(RpnParam, MaskParam)
    re = M.FPNRoiAlign(RoiParam)
    mre = M.FPNRoiAlign(MaskRoiParam)
    bh = M.FPNBbox2fcHead(BboxParam)
    mh = M.MaskFasterRcnn4ConvHead(BboxParam, MaskParam, MaskRoiParam)
    ih = M.MaskIoUConvHead(TestParam, BboxParam, MaskParam)
    pp = M.BboxPostProcessor(TestParam)
    det = M.MaskScoringFasterRcnn()
    if is_train:
        ModelParam.train_symbol = det.get_train_symbol(
            bb, nk, rh, re, mre, bh, mh, ih)
    else:
        ModelParam.test_symbol = det.get_test_symbol(
            bb, nk, rh, re, mre, bh, mh, ih, pp)
    return tuple(cfg)
