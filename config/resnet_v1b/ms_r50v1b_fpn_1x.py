"""ms_r50v1b_fpn_1x (reference config/resnet_v1b/): Mask Scoring R-CNN with
the v1b backbone — the mask config re-assembled with the MaskIoU head."""
from simpledet_tpu.config_templates import mask_fpn_config


def get_config(is_train):
    import models.msrcnn.builder as M
    cfg = list(mask_fpn_config(is_train, __name__, depth=50, variant="v1b"))
    General, RpnParam, BboxParam, ModelParam, TestParam = (
        cfg[0], cfg[2], cfg[4], cfg[6], cfg[8])

    class _P:
        fp16 = General.fp16
        normalizer = None

    class MaskParam(_P):
        resolution = 28
        dim_reduced = 256
        num_fg_roi = 128

    class RoiParam(_P):
        out_size = 7
        stride = (4, 8, 16, 32)
        roi_canonical_scale = 224
        roi_canonical_level = 4

    class MaskRoiParam(RoiParam):
        out_size = 14

    bb = M.ResNet50V1bFPN(_P) if hasattr(M, "ResNet50V1bFPN") else None
    if bb is None:
        from models.FPN.builder import ResNet50V1bFPN
        bb = ResNet50V1bFPN(_P)
    nk = M.FPNNeck(_P)
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
