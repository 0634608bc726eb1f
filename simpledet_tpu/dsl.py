"""Detector-composition DSL — config-facing component classes.

This is the compatibility layer that lets reference-style configs port
unchanged (reference symbol/builder.py + models/FPN/builder.py public
classes): configs instantiate Backbone/Neck/RpnHead/RoiExtractor/BboxHead
wrappers from param classes and hand them to a Detector whose
get_train_symbol/get_test_symbol return the assembled model. Here a "symbol"
is a bound Flax module (the jittable graph), not an MXNet symbol.

Repo-root `symbol/` and `models/` shim packages re-export these names so
`from symbol.builder import FasterRcnn` works as in the reference.
"""
import jax.numpy as jnp

from simpledet_tpu.core.config import patch_config_as_nothrow
from simpledet_tpu.models import fpn as fpn_mod
from simpledet_tpu.models import heads as heads_mod
from simpledet_tpu.models import resnet as resnet_mod
from simpledet_tpu.models.faster_rcnn import FasterRcnn as FasterRcnnModule
from simpledet_tpu.models.norm import normalizer_factory
from simpledet_tpu.models.rpn import FPNRpnHead as RpnHeadImpl


def _dtype(p):
    # fp16 on the reference == bf16 on TPU (no loss scaling needed)
    return jnp.bfloat16 if getattr(p, "fp16", False) else jnp.float32


def _norm(p):
    n = getattr(p, "normalizer", None)
    if n is None:
        return normalizer_factory("fixbn")
    return n


class _BackboneBase:
    depth = 50
    variant = "v1"
    num_stages = 4

    def __init__(self, pBackbone):
        p = patch_config_as_nothrow(pBackbone)
        self.p = p
        self.module = resnet_mod.ResNet(
            depth=self.depth, variant=self.variant, norm=_norm(p),
            dtype=_dtype(p), num_stages=self.num_stages,
            name="backbone")


class MSRAResNet50V1FPN(_BackboneBase):
    depth, variant, num_stages = 50, "v1", 4


class MSRAResNet101V1FPN(_BackboneBase):
    depth, variant, num_stages = 101, "v1", 4


class ResNet50V1bFPN(_BackboneBase):
    depth, variant, num_stages = 50, "v1b", 4


class ResNet101V1bFPN(_BackboneBase):
    depth, variant, num_stages = 101, "v1b", 4


class ResNet152V1bFPN(_BackboneBase):
    depth, variant, num_stages = 152, "v1b", 4


class ResNet50V1dFPN(_BackboneBase):
    depth, variant, num_stages = 50, "v1d", 4


class ResNeXt50FPN(_BackboneBase):
    depth, variant, num_stages = 50, "x", 4


class ResNeXt101FPN(_BackboneBase):
    depth, variant, num_stages = 101, "x", 4


class ResNeXt101C4(_BackboneBase):
    depth, variant, num_stages = 101, "x", 3


class MSRAResNet50V1C4(_BackboneBase):
    depth, variant, num_stages = 50, "v1", 3


class MSRAResNet101V1C4(_BackboneBase):
    depth, variant, num_stages = 101, "v1", 3


def hybrid_resnet_builder(special_block, num_stages=4, variant="v1b"):
    """DCN/SE-style hybrid backbones (reference models/dcn/builder.py:56-114):
    the last `num_cX_block` units of each stage use `special_block`."""

    class HybridBackbone(_BackboneBase):
        def __init__(self, pBackbone):
            p = patch_config_as_nothrow(pBackbone)
            self.p = p
            self.module = resnet_mod.ResNet(
                depth=p.depth or 50, variant=variant, norm=_norm(p),
                dtype=_dtype(p), num_stages=num_stages,
                num_special=(p.num_c2_block or 0, p.num_c3_block or 0,
                             p.num_c4_block or 0, p.num_c5_block or 0),
                special_block=special_block, name="backbone")

    return HybridBackbone


def hybrid_resnet_c4_builder(special_block, variant="v1b"):
    return hybrid_resnet_builder(special_block, num_stages=3,
                                 variant=variant)


def hybrid_resnet_fpn_builder(special_block, variant="v1b"):
    return hybrid_resnet_builder(special_block, num_stages=4,
                                 variant=variant)


class FPNNeck:
    def __init__(self, pNeck):
        p = patch_config_as_nothrow(pNeck)
        self.p = p
        self.module = fpn_mod.FPNNeck(dtype=_dtype(p), name="neck")


class Neck:
    def __init__(self, pNeck):
        p = patch_config_as_nothrow(pNeck)
        self.p = p
        self.module = fpn_mod.Neck(name="neck")


class ReduceNeck:
    """Channel-reduce neck wrapper (reference symbol/builder.py:833)."""

    def __init__(self, pNeck):
        p = patch_config_as_nothrow(pNeck)
        self.p = p
        norm = None
        if p.normalizer is not None and \
                getattr(p.normalizer, "type", "") in ("syncbn", "gn"):
            norm = _norm(p)
        self.module = fpn_mod.ReduceNeck(
            filters=(p.reduce.channel if p.reduce else None) or 256,
            norm=norm, dtype=_dtype(p), name="neck")


class _C4C5Base:
    """Full v2 ResNet with dilated stage4 (stride-16 c5) published as the
    single-level 'stride16' feature (reference mxnext resnet C4C5 forms,
    symbol/builder.py MXNetResNet50V2C4C5)."""
    depth = 50
    variant = "v2"

    def __init__(self, pBackbone):
        from simpledet_tpu.models.dcn import C4StrideKeyAdapter
        p = patch_config_as_nothrow(pBackbone)
        self.p = p
        inner = resnet_mod.ResNet(
            depth=p.depth or self.depth, variant=self.variant, norm=_norm(p),
            dtype=_dtype(p), num_stages=4, stage4_dilation=2,
            name="backbone")
        self.module = C4StrideKeyAdapter(inner=inner, key="c5")


class MXNetResNet50V2C4C5(_C4C5Base):
    depth = 50


class MXNetResNet101V2C4C5(_C4C5Base):
    depth = 101


class FPNRpnHead:
    def __init__(self, pRpn):
        p = patch_config_as_nothrow(pRpn)
        p.dtype = _dtype(p)
        self.p = p
        self.impl = RpnHeadImpl(p)


class FPNRoiAlign:
    def __init__(self, pRoi):
        self.p = patch_config_as_nothrow(pRoi)


class RoiAlign(FPNRoiAlign):
    pass


class FPNBbox2fcHead:
    def __init__(self, pBbox):
        p = patch_config_as_nothrow(pBbox)
        self.p = p
        num_reg = 2 if (p.regress_target.class_agnostic or False) else p.num_class
        self.module = heads_mod.Bbox2fcHead(
            num_class=p.num_class, num_reg_class=num_reg, dtype=_dtype(p),
            name="bbox_head")


Bbox2fcHead = FPNBbox2fcHead


class FPNBboxDualHeadSmall:
    """Double-Head bbox head wrapper (reference models/FPN/builder.py:11)."""

    def __init__(self, pBbox):
        from simpledet_tpu.models import heads as heads_mod
        p = patch_config_as_nothrow(pBbox)
        self.p = p
        num_reg = 2 if (p.regress_target.class_agnostic or False) \
            else p.num_class
        norm = None
        if p.normalizer is not None and \
                getattr(p.normalizer, "type", "") in ("syncbn", "gn"):
            norm = _norm(p)
        self.module = heads_mod.BboxDualHeadSmall(
            num_class=p.num_class, num_reg_class=num_reg,
            num_block=p.num_block or 4, norm=norm, dtype=_dtype(p),
            name="bbox_head")


class Bbox1conv2fcHead:
    """1conv2fc head (reference symbol/builder.py:482)."""

    def __init__(self, pBbox):
        p = patch_config_as_nothrow(pBbox)
        self.p = p
        num_reg = 2 if (p.regress_target.class_agnostic or False) \
            else p.num_class
        self.module = heads_mod.Bbox1conv2fcHead(
            num_class=p.num_class, num_reg_class=num_reg, dtype=_dtype(p),
            norm=_norm(p) if (p.normalizer and getattr(p.normalizer, "type",
                                                       "") == "gn") else None,
            name="bbox_head")


class Bbox4conv1fcHead:
    """4conv1fc head (reference symbol/builder.py:516)."""

    def __init__(self, pBbox):
        p = patch_config_as_nothrow(pBbox)
        self.p = p
        num_reg = 2 if (p.regress_target.class_agnostic or False) \
            else p.num_class
        self.module = heads_mod.Bbox4conv1fcHead(
            num_class=p.num_class, num_reg_class=num_reg, dtype=_dtype(p),
            name="bbox_head")


class FasterRcnn:
    """Detector singleton matching reference symbol/builder.py:42-95."""

    @staticmethod
    def _assemble(backbone, neck, rpn_head, roi_extractor, bbox_head):
        return FasterRcnnModule(
            backbone=backbone.module, neck=neck.module,
            rpn_module=rpn_head.impl.module, rpn=rpn_head.impl,
            bbox_head=bbox_head.module, p_rpn=rpn_head.p,
            p_roi=roi_extractor.p, p_bbox=bbox_head.p)

    def get_train_symbol(self, backbone, neck, rpn_head, roi_extractor,
                         bbox_head):
        return self._assemble(backbone, neck, rpn_head, roi_extractor,
                              bbox_head)

    def get_test_symbol(self, backbone, neck, rpn_head, roi_extractor,
                        bbox_head):
        return self._assemble(backbone, neck, rpn_head, roi_extractor,
                              bbox_head)

    def get_rpn_test_symbol(self, backbone, neck, rpn_head):
        # proposal-only graph: no roi/bbox-head params are created or touched
        from simpledet_tpu.models.faster_rcnn import RpnOnly
        return RpnOnly(backbone=backbone.module, neck=neck.module,
                       rpn_module=rpn_head.impl.module, rpn=rpn_head.impl)


class RPN:
    """RPN-only detector (reference symbol/builder.py:9-39). Also serves as
    the detector singleton for anchor-free heads (the reference's FCOS config
    instantiates `RPN` with an FCOSFPNHead)."""

    @staticmethod
    def _assemble(backbone, neck, rpn_head):
        if isinstance(rpn_head, FCOSFPNHead):
            return FCOSDetector._assemble(backbone, neck, rpn_head)
        from simpledet_tpu.models.faster_rcnn import RpnOnly
        return RpnOnly(backbone=backbone.module, neck=neck.module,
                       rpn_module=rpn_head.impl.module, rpn=rpn_head.impl)

    def get_train_symbol(self, backbone, neck, rpn_head):
        return self._assemble(backbone, neck, rpn_head)

    def get_test_symbol(self, backbone, neck, rpn_head):
        return self._assemble(backbone, neck, rpn_head)

    def get_rpn_test_symbol(self, backbone, neck, rpn_head):
        return self._assemble(backbone, neck, rpn_head)


class MaskFPNRpnHead(FPNRpnHead):
    """RPN head for Mask R-CNN (reference models/maskrcnn/builder.py:156);
    the mask-aware proposal sampling lives in the detector module."""

    def __init__(self, pRpn, pMask=None):
        super().__init__(pRpn)
        self.p_mask = patch_config_as_nothrow(pMask)


class MaskRpnHead(MaskFPNRpnHead):
    pass


class MaskFasterRcnn4ConvHead:
    def __init__(self, pBbox, pMask, pMaskRoi):
        from simpledet_tpu.models import mask_rcnn as mask_mod
        self.p_bbox = patch_config_as_nothrow(pBbox)
        self.p = patch_config_as_nothrow(pMask)
        self.p_roi = patch_config_as_nothrow(pMaskRoi)
        self.module = mask_mod.MaskHead4Conv(
            num_class=self.p_bbox.num_class,
            dim_reduced=self.p.dim_reduced or 256,
            dtype=_dtype(self.p), name="mask_head")


class BboxPostProcessor:
    """In-graph per-class NMS params holder (reference
    models/maskrcnn/builder.py:66-89 BboxPostProcessor)."""

    def __init__(self, pTest):
        self.p = patch_config_as_nothrow(pTest)


class MaskFasterRcnn:
    """Detector singleton (reference models/maskrcnn/builder.py:14-64)."""

    @staticmethod
    def _assemble(backbone, neck, rpn_head, roi_extractor,
                  mask_roi_extractor, bbox_head, mask_head,
                  bbox_post_processor=None):
        from simpledet_tpu.models.mask_rcnn import MaskFasterRcnn as Module
        return Module(
            backbone=backbone.module, neck=neck.module,
            rpn_module=rpn_head.impl.module, rpn=rpn_head.impl,
            bbox_head=bbox_head.module, p_rpn=rpn_head.p,
            p_roi=roi_extractor.p, p_bbox=bbox_head.p,
            mask_head=mask_head.module, p_mask=mask_head.p,
            p_mask_roi=mask_roi_extractor.p,
            p_test=bbox_post_processor.p if bbox_post_processor else None)

    def get_train_symbol(self, backbone, neck, rpn_head, roi_extractor,
                         mask_roi_extractor, bbox_head, mask_head):
        return self._assemble(backbone, neck, rpn_head, roi_extractor,
                              mask_roi_extractor, bbox_head, mask_head)

    def get_test_symbol(self, backbone, neck, rpn_head, roi_extractor,
                        mask_roi_extractor, bbox_head, mask_head,
                        bbox_post_processor):
        return self._assemble(backbone, neck, rpn_head, roi_extractor,
                              mask_roi_extractor, bbox_head, mask_head,
                              bbox_post_processor)

    def get_rpn_test_symbol(self, backbone, neck, rpn_head):
        return FasterRcnn().get_rpn_test_symbol(backbone, neck, rpn_head)


class CascadeBbox2fcHead:
    """Per-stage 2fc head (reference models/cascade_rcnn/builder.py:171-260);
    distinct parameters per stage via the stage-suffixed module name."""

    def __init__(self, pBbox):
        p = patch_config_as_nothrow(pBbox)
        self.p = p
        num_reg = 2 if (p.regress_target.class_agnostic
                        if p.regress_target.class_agnostic is not None
                        else True) else p.num_class
        self.module = heads_mod.Bbox2fcHead(
            num_class=p.num_class, num_reg_class=num_reg, dtype=_dtype(p),
            name=f"bbox_head_{p.stage or '1st'}")


class CascadeRcnn:
    """Detector singleton (reference models/cascade_rcnn/builder.py:10-135)."""

    @staticmethod
    def _assemble(backbone, neck, rpn_head, roi_extractor, bbox_head,
                  bbox_head_2nd, bbox_head_3rd):
        from simpledet_tpu.models.cascade_rcnn import CascadeRcnn as Module
        heads = (bbox_head, bbox_head_2nd, bbox_head_3rd)
        return Module(
            backbone=backbone.module, neck=neck.module,
            rpn_module=rpn_head.impl.module, rpn=rpn_head.impl,
            head_1st=heads[0].module, head_2nd=heads[1].module,
            head_3rd=heads[2].module, p_rpn=rpn_head.p,
            p_roi=roi_extractor.p, p_bboxes=tuple(h.p for h in heads))

    def get_train_symbol(self, backbone, neck, rpn_head, roi_extractor,
                         bbox_head, bbox_head_2nd, bbox_head_3rd):
        return self._assemble(backbone, neck, rpn_head, roi_extractor,
                              bbox_head, bbox_head_2nd, bbox_head_3rd)

    def get_test_symbol(self, backbone, neck, rpn_head, roi_extractor,
                        bbox_head, bbox_head_2nd, bbox_head_3rd):
        return self._assemble(backbone, neck, rpn_head, roi_extractor,
                              bbox_head, bbox_head_2nd, bbox_head_3rd)

    def get_rpn_test_symbol(self, backbone, neck, rpn_head):
        return FasterRcnn().get_rpn_test_symbol(backbone, neck, rpn_head)


class RetinaNetNeck:
    def __init__(self, pNeck):
        from simpledet_tpu.models import retinanet as retina_mod
        p = patch_config_as_nothrow(pNeck)
        self.p = p
        self.module = retina_mod.RetinaNetNeck(dtype=_dtype(p), name="neck")


class RetinaNetNeckWithBN(RetinaNetNeck):
    """BN-normalized retina neck (models/NASFPN/builder.py RetinaNetNeckWithBN)."""

    def __init__(self, pNeck):
        from simpledet_tpu.models import retinanet as retina_mod
        p = patch_config_as_nothrow(pNeck)
        self.p = p
        self.module = retina_mod.RetinaNetNeck(dtype=_dtype(p), norm=_norm(p),
                                               name="neck")


class RetinaNetHead:
    def __init__(self, pRpn):
        from simpledet_tpu.models import retinanet as retina_mod
        p = patch_config_as_nothrow(pRpn)
        p.dtype = _dtype(p)
        self.p = p
        self.impl = retina_mod.RetinaNetHead(p)


class RetinaNet:
    """Single-stage detector singleton
    (reference models/retinanet/builder.py:10-38)."""

    @staticmethod
    def _assemble(backbone, neck, head):
        from simpledet_tpu.models.retinanet import RetinaNet as RetinaModule
        return RetinaModule(backbone=backbone.module, neck=neck.module,
                            head_module=head.impl.module, head=head.impl)

    def get_train_symbol(self, backbone, neck, head):
        return self._assemble(backbone, neck, head)

    def get_test_symbol(self, backbone, neck, head):
        return self._assemble(backbone, neck, head)


class TSDConvFCBBoxHead:
    """TSD head wrapper (reference models/TSD/bbox_head.py:53)."""

    def __init__(self, pBbox, delta_c_pool=None, delta_r_pool=None):
        from simpledet_tpu.models.tsd import TSDBboxHead
        p = patch_config_as_nothrow(pBbox)
        self.p = p
        num_reg = 2 if (p.regress_target.class_agnostic or False) \
            else p.num_class
        self.module = TSDBboxHead(
            num_class=p.num_class, num_reg_class=num_reg,
            roi_size=p.roi_size or 7, dtype=_dtype(p), name="bbox_head")


class FPNRoIAlign_DeltaC(FPNRoiAlign):
    """Offset-pooling param holders (reference models/TSD/poolings.py);
    the deformable pooling itself runs inside TSDFasterRcnn."""
    pass


class FPNRoIAlign_DeltaR(FPNRoiAlign):
    pass


class TSDFasterRcnn(FasterRcnn):
    """Detector singleton (reference models/TSD/faster_rcnn.py)."""

    @staticmethod
    def _assemble(backbone, neck, rpn_head, roi_extractor, bbox_head,
                  p_tsd=None):
        from simpledet_tpu.models.tsd import TSDFasterRcnn as Module
        return Module(
            backbone=backbone.module, neck=neck.module,
            rpn_module=rpn_head.impl.module, rpn=rpn_head.impl,
            bbox_head=bbox_head.module, p_rpn=rpn_head.p,
            p_roi=roi_extractor.p, p_bbox=bbox_head.p,
            p_tsd=patch_config_as_nothrow(p_tsd) if p_tsd else
            patch_config_as_nothrow(getattr(bbox_head.p, "TSD", None)))

    def get_train_symbol(self, backbone, neck, rpn_head, roi_extractor,
                         bbox_head, p_tsd=None):
        return self._assemble(backbone, neck, rpn_head, roi_extractor,
                              bbox_head, p_tsd)

    def get_test_symbol(self, backbone, neck, rpn_head, roi_extractor,
                        bbox_head, p_tsd=None):
        return self._assemble(backbone, neck, rpn_head, roi_extractor,
                              bbox_head, p_tsd)


class RepPointsHead:
    def __init__(self, pHead):
        from simpledet_tpu.models.reppoints import RepPointsHead as Impl
        p = patch_config_as_nothrow(pHead)
        p.dtype = _dtype(p)
        self.p = p
        self.impl = Impl(p)


class RepPointsDetector:
    """Detector singleton for RepPoints (the reference uses RetinaNet-style
    3-arg assembly)."""

    @staticmethod
    def _assemble(backbone, neck, head):
        from simpledet_tpu.models.reppoints import RepPoints as Module
        return Module(backbone=backbone.module, neck=neck.module,
                      head_module=head.impl.module, head=head.impl)

    def get_train_symbol(self, backbone, neck, head):
        return self._assemble(backbone, neck, head)

    def get_test_symbol(self, backbone, neck, head):
        return self._assemble(backbone, neck, head)


class TridentMXNetResNetV2:
    """Trident ResNet-v2 C4 backbone wrapper (reference
    models/tridentnet/builder.py:474 / resnet_v2.py TridentResNetV2Builder)."""

    def __init__(self, pBackbone):
        from simpledet_tpu.models.tridentnet import TridentResNetV2C4
        p = patch_config_as_nothrow(pBackbone)
        self.p = p
        trident = p.trident or p
        self.num_branch = (trident and trident.num_branch) or 3
        dilations = tuple((trident and trident.branch_dilates) or (1, 2, 3))
        self.module = TridentResNetV2C4(
            depth=p.depth or 50, norm=_norm(p), dtype=_dtype(p),
            num_branch=self.num_branch, dilations=dilations, name="backbone")


TridentResNetV2C4 = TridentMXNetResNetV2


class TridentResNetV1C4:
    """Trident ResNet-v1 C4 backbone wrapper (reference
    models/tridentnet/builder_v2.py TridentResNetV1C4)."""
    variant = "v1"

    def __init__(self, pBackbone):
        from simpledet_tpu.models.tridentnet import \
            TridentResNetV1C4 as Module
        p = patch_config_as_nothrow(pBackbone)
        self.p = p
        trident = p.trident or p
        self.num_branch = (trident and trident.num_branch) or 3
        dilations = tuple((trident and trident.branch_dilates) or (1, 2, 3))
        self.module = Module(
            depth=p.depth or 50, variant=self.variant, norm=_norm(p),
            dtype=_dtype(p), num_branch=self.num_branch, dilations=dilations,
            name="backbone")


class TridentResNetV1bC4(TridentResNetV1C4):
    """Trident ResNet-v1b C4 (stride on the 3x3; reference builder_v2.py
    TridentResNetV1bC4)."""
    variant = "v1b"


class TridentRpnHead(FPNRpnHead):
    """Single-level RPN head for trident C4 (reference
    models/tridentnet/builder.py:204)."""
    pass


class BboxC5Head:
    """ResNet stage-5 bbox head (reference symbol/builder.py:554 BboxC5Head /
    trident BboxC5V2Head)."""

    def __init__(self, pBbox):
        from simpledet_tpu.models.tridentnet import BboxC5V2Head
        p = patch_config_as_nothrow(pBbox)
        self.p = p
        num_reg = 2 if (p.regress_target.class_agnostic or False) \
            else p.num_class
        self.module = BboxC5V2Head(
            num_class=p.num_class, num_reg_class=num_reg,
            depth=p.depth or 50, norm=_norm(p), dtype=_dtype(p),
            name="bbox_head")


class BboxC5V1Head:
    """ResNet-v1/v1b stage-5 bbox head (reference symbol/builder.py:614);
    p.variant selects stride placement ("v1" default, "v1b")."""

    def __init__(self, pBbox):
        from simpledet_tpu.models.tridentnet import \
            BboxC5V1Head as Module
        p = patch_config_as_nothrow(pBbox)
        self.p = p
        num_reg = 2 if (p.regress_target.class_agnostic or False) \
            else p.num_class
        self.module = Module(
            num_class=p.num_class, num_reg_class=num_reg,
            depth=p.depth or 50, variant=p.variant or "v1", norm=_norm(p),
            dtype=_dtype(p), name="bbox_head")


BboxResNeXtC5Head = BboxC5Head


class TridentFasterRcnn:
    """Detector singleton (reference models/tridentnet/builder.py:55-129)."""

    @staticmethod
    def _assemble(backbone, neck, rpn_head, roi_extractor, bbox_head,
                  num_branch, scaleaware, valid_ranges=None):
        from simpledet_tpu.models.tridentnet import \
            TridentFasterRcnn as Module
        kw = {}
        if valid_ranges is not None:
            kw["valid_ranges"] = tuple(tuple(v) for v in valid_ranges)
        return Module(
            backbone=backbone.module, neck=neck.module,
            rpn_module=rpn_head.impl.module, rpn=rpn_head.impl,
            bbox_head=bbox_head.module, p_rpn=rpn_head.p,
            p_roi=roi_extractor.p, p_bbox=bbox_head.p,
            num_branch=num_branch, scaleaware=bool(scaleaware), **kw)

    def get_train_symbol(self, backbone, neck, rpn_head, roi_extractor,
                         bbox_head, num_branch, scaleaware,
                         valid_ranges=None):
        return self._assemble(backbone, neck, rpn_head, roi_extractor,
                              bbox_head, num_branch, scaleaware,
                              valid_ranges)

    def get_test_symbol(self, backbone, neck, rpn_head, roi_extractor,
                        bbox_head, num_branch, scaleaware=True,
                        valid_ranges=None):
        return self._assemble(backbone, neck, rpn_head, roi_extractor,
                              bbox_head, num_branch, scaleaware,
                              valid_ranges)


class TridentMaskRcnn(TridentFasterRcnn):
    """Detector singleton (reference models/tridentnet/builder.py:131)."""

    @staticmethod
    def _assemble_mask(backbone, neck, rpn_head, roi_extractor,
                       mask_roi_extractor, bbox_head, mask_head, num_branch,
                       scaleaware, valid_ranges=None):
        from simpledet_tpu.models.tridentnet import TridentMaskRcnn as Module
        kw = {}
        if valid_ranges is not None:
            kw["valid_ranges"] = tuple(tuple(v) for v in valid_ranges)
        return Module(
            backbone=backbone.module, neck=neck.module,
            rpn_module=rpn_head.impl.module, rpn=rpn_head.impl,
            bbox_head=bbox_head.module, p_rpn=rpn_head.p,
            p_roi=roi_extractor.p, p_bbox=bbox_head.p,
            num_branch=num_branch, scaleaware=bool(scaleaware),
            mask_head=mask_head.module, p_mask=mask_head.p, **kw)

    def get_train_symbol(self, backbone, neck, rpn_head, roi_extractor,
                         mask_roi_extractor, bbox_head, mask_head,
                         num_branch, scaleaware, valid_ranges=None):
        return self._assemble_mask(backbone, neck, rpn_head, roi_extractor,
                                   mask_roi_extractor, bbox_head, mask_head,
                                   num_branch, scaleaware, valid_ranges)

    def get_test_symbol(self, backbone, neck, rpn_head, roi_extractor,
                        mask_roi_extractor, bbox_head, mask_head,
                        bbox_post_processor=None, num_branch=3,
                        scaleaware=True, valid_ranges=None):
        return self._assemble_mask(backbone, neck, rpn_head, roi_extractor,
                                   mask_roi_extractor, bbox_head, mask_head,
                                   num_branch, scaleaware, valid_ranges)


def process_branch_outputs(*args, **kw):
    """No-op: branch filtering/merging happens in-graph (the trident test
    mode folds branches into the detection axis and masks out-of-range
    scores; reference models/tridentnet/builder.py:538-571)."""
    return args[0] if args else None


process_branch_rpn_outputs = process_branch_outputs


class MaskIoUConvHead:
    """MaskIoU scoring head (reference models/msrcnn/builder.py:65)."""

    def __init__(self, pTest, pBbox, pMask):
        from simpledet_tpu.models.msrcnn import MaskIoUHead
        self.p_test = patch_config_as_nothrow(pTest)
        self.p_bbox = patch_config_as_nothrow(pBbox)
        self.p = patch_config_as_nothrow(pMask)
        self.module = MaskIoUHead(num_class=self.p_bbox.num_class,
                                  dtype=_dtype(self.p), name="maskiou_head")


class MaskScoringFasterRcnn(MaskFasterRcnn):
    """Detector singleton (reference models/msrcnn/builder.py:13-63)."""

    @staticmethod
    def _assemble(backbone, neck, rpn_head, roi_extractor,
                  mask_roi_extractor, bbox_head, mask_head, maskiou_head,
                  bbox_post_processor=None):
        from simpledet_tpu.models.msrcnn import \
            MaskScoringFasterRcnn as Module
        return Module(
            backbone=backbone.module, neck=neck.module,
            rpn_module=rpn_head.impl.module, rpn=rpn_head.impl,
            bbox_head=bbox_head.module, p_rpn=rpn_head.p,
            p_roi=roi_extractor.p, p_bbox=bbox_head.p,
            mask_head=mask_head.module, p_mask=mask_head.p,
            p_mask_roi=mask_roi_extractor.p,
            p_test=bbox_post_processor.p if bbox_post_processor else None,
            maskiou_head=maskiou_head.module)

    def get_train_symbol(self, backbone, neck, rpn_head, roi_extractor,
                         mask_roi_extractor, bbox_head, mask_head,
                         maskiou_head):
        return self._assemble(backbone, neck, rpn_head, roi_extractor,
                              mask_roi_extractor, bbox_head, mask_head,
                              maskiou_head)

    def get_test_symbol(self, backbone, neck, rpn_head, roi_extractor,
                        mask_roi_extractor, bbox_head, mask_head,
                        maskiou_head, bbox_post_processor):
        return self._assemble(backbone, neck, rpn_head, roi_extractor,
                              mask_roi_extractor, bbox_head, mask_head,
                              maskiou_head, bbox_post_processor)


class FitNetHead:
    """FitNet hint head (reference models/KD/builder.py:12)."""

    def __init__(self, pKD):
        from simpledet_tpu.models.kd import FitNetHead as Impl
        p = patch_config_as_nothrow(pKD)
        self.p = p
        self.module = Impl(channel=p.channel or 256, stage=p.stage or "c4",
                           grad_scale=p.grad_scale or 1.0, name="kd_head")


class FitNetFasterRcnn(FasterRcnn):
    """KD detector singleton (reference models/KD/builder.py:71)."""

    def get_train_symbol(self, backbone, neck, rpn_head, roi_extractor,
                         bbox_head, kd_head):
        from simpledet_tpu.models.kd import FitNetFasterRcnn as Module
        return Module(
            backbone=backbone.module, neck=neck.module,
            rpn_module=rpn_head.impl.module, rpn=rpn_head.impl,
            bbox_head=bbox_head.module, p_rpn=rpn_head.p,
            p_roi=roi_extractor.p, p_bbox=bbox_head.p,
            kd_head=kd_head.module)


class FitNetRetinaNet(RetinaNet):
    """KD RetinaNet singleton (reference models/KD/builder.py:45)."""

    def get_train_symbol(self, backbone, neck, head, kd_head):
        from simpledet_tpu.models.kd import FitNetRetinaNet as Module
        return Module(backbone=backbone.module, neck=neck.module,
                      head_module=head.impl.module, head=head.impl,
                      kd_head=kd_head.module)


class DoublePredFPNBbox2fcHead:
    """Double-prediction head (reference models/crowdhuman/builder.py:330)."""

    def __init__(self, pBbox):
        from simpledet_tpu.models.crowdhuman import DoublePredBbox2fcHead
        p = patch_config_as_nothrow(pBbox)
        self.p = p
        num_reg = 2 if (p.regress_target.class_agnostic or False) \
            else p.num_class
        self.module = DoublePredBbox2fcHead(
            num_class=p.num_class, num_reg_class=num_reg,
            refine=bool(p.refine_mode), repeat_time=p.repeat_time or 4,
            dtype=_dtype(p), name="bbox_head")


class DoublePredRcnn:
    """Detector singleton (reference models/crowdhuman/builder.py:12-48)."""

    @staticmethod
    def _assemble(backbone, neck, rpn_head, roi_extractor, bbox_head):
        from simpledet_tpu.models.crowdhuman import DoublePredRcnn as Module
        return Module(
            backbone=backbone.module, neck=neck.module,
            rpn_module=rpn_head.impl.module, rpn=rpn_head.impl,
            bbox_head=bbox_head.module, p_rpn=rpn_head.p,
            p_roi=roi_extractor.p, p_bbox=bbox_head.p)

    def get_train_symbol(self, backbone, neck, rpn_head, roi_extractor,
                         bbox_head):
        return self._assemble(backbone, neck, rpn_head, roi_extractor,
                              bbox_head)

    def get_test_symbol(self, backbone, neck, rpn_head, roi_extractor,
                        bbox_head):
        return self._assemble(backbone, neck, rpn_head, roi_extractor,
                              bbox_head)

    def get_rpn_test_symbol(self, backbone, neck, rpn_head):
        return FasterRcnn().get_rpn_test_symbol(backbone, neck, rpn_head)


class FPNRpnHeadwithIgnore(FPNRpnHead):
    """Ignore-region-aware RPN head (reference models/crowdhuman/builder.py
    :356). Ignore regions are gt rows with class == -2: excluded from
    assignment/sampling, and anchors covering one (IoF > 0.5) are removed
    from the background pool (targets/anchor_target.py) — semantics are in
    the shared in-graph targets, so this alias is behaviorally identical to
    FPNRpnHead."""

    def __init__(self, pRpn):
        super().__init__(pRpn)
        self.p.ignore_regions = True


class FreeAnchorRetinaNetHead:
    """Learning-to-match retina head (reference models/FreeAnchor/builder.py
    FreeAnchorRetinaNetHead:42)."""

    def __init__(self, pRpn):
        from simpledet_tpu.models.freeanchor import \
            FreeAnchorRetinaNetHead as Impl
        p = patch_config_as_nothrow(pRpn)
        p.dtype = _dtype(p)
        self.p = p
        self.impl = Impl(p)


class RetinaNetHeadWithBN(RetinaNetHead):
    """Retina subnets with per-level BN (reference models/NASFPN/builder.py
    RetinaNetHeadWithBN)."""

    def __init__(self, pRpn):
        from simpledet_tpu.models import retinanet as retina_mod
        p = patch_config_as_nothrow(pRpn)
        p.dtype = _dtype(p)
        self.p = p
        self.impl = retina_mod.RetinaNetHead(p)
        self.impl.module = retina_mod.RetinaSubnets(
            num_anchor=self.impl.num_anchor,
            num_fg_class=self.impl.num_fg_class,
            conv_channel=p.head.conv_channel, norm=_norm(p), dtype=_dtype(p))


class _NeckWrapper:
    module_cls = None
    kwargs = {}

    def __init__(self, pNeck):
        p = patch_config_as_nothrow(pNeck)
        self.p = p
        kw = dict(self.kwargs)
        if p.dim_reduced:
            kw["filters"] = p.dim_reduced
        if p.num_stage:
            kw["num_stage"] = p.num_stage
        if p.S0_kernel and "s0_kernel" in self.module_cls.__dataclass_fields__:
            kw["s0_kernel"] = p.S0_kernel
        norm = getattr(p, "normalizer", None)
        if norm is not None and getattr(norm, "type", "") in ("syncbn",
                                                              "localbn",
                                                              "gn"):
            kw["norm"] = norm
        self.module = self.module_cls(dtype=_dtype(p), name="neck", **kw)


class NASFPNNeck(_NeckWrapper):
    from simpledet_tpu.models.nasfpn import NASFPNNeck as module_cls


class TopDownBottomUpFPNNeck(_NeckWrapper):
    from simpledet_tpu.models.nasfpn import \
        TopDownBottomUpFPNNeck as module_cls


class PAFPNNeck(_NeckWrapper):
    from simpledet_tpu.models.fpg import PAFPNNeckP2P6 as module_cls


class PAFPNNeckP2P6(PAFPNNeck):
    pass


class PAFPNNeckP3P7(_NeckWrapper):
    from simpledet_tpu.models.fpg import PAFPNNeckP3P7 as module_cls


class FPGNeck(_NeckWrapper):
    from simpledet_tpu.models.fpg import FPGNeckP3P7 as module_cls


class FPGNeckP2P6(_NeckWrapper):
    from simpledet_tpu.models.fpg import FPGNeckP2P6 as module_cls


def efficientnet_fpn_builder(variant):
    from simpledet_tpu.models.efficientnet import EfficientNet

    class EffNetFPN:
        def __init__(self, pBackbone):
            p = patch_config_as_nothrow(pBackbone)
            self.p = p
            self.module = EfficientNet(variant=variant, norm=_norm(p),
                                       dtype=_dtype(p), name="backbone")

    return EffNetFPN


EfficientNetB4FPN = efficientnet_fpn_builder("b4")
EfficientNetB5FPN = efficientnet_fpn_builder("b5")
EfficientNetB6FPN = efficientnet_fpn_builder("b6")
EfficientNetB7FPN = efficientnet_fpn_builder("b7")


class MaskRcnnSe4convHead:
    """SE-augmented mask head (reference models/se/builder.py:67-96)."""

    def __init__(self, pBbox, pMask, pMaskRoi):
        from simpledet_tpu.models.se import SEMaskHead4Conv
        self.p_bbox = patch_config_as_nothrow(pBbox)
        self.p = patch_config_as_nothrow(pMask)
        self.p_roi = patch_config_as_nothrow(pMaskRoi)
        self.module = SEMaskHead4Conv(
            num_class=self.p_bbox.num_class,
            dim_reduced=self.p.dim_reduced or 256,
            dtype=_dtype(self.p), name="mask_head")


class RetinaNetNeckWithBNWithSEPC(RetinaNetNeckWithBN):
    """RetinaNet neck + stacked SEPC pyramid convs (reference
    models/sepc/builder.py:10-50)."""

    def __init__(self, pNeck, pSEPC=None):
        import flax.linen as nn

        from simpledet_tpu.models import retinanet as retina_mod
        from simpledet_tpu.models.sepc import SEPCFPN
        p = patch_config_as_nothrow(pNeck)
        ps = patch_config_as_nothrow(pSEPC) if pSEPC is not None else None
        self.p = p
        dtype = _dtype(p)
        norm = _norm(p)
        pconv_num = (ps and ps.Pconv_num) or 4
        pconv_deform = bool(ps and ps.pconv_deform)
        lcconv_deform = bool(ps and ps.lcconv_deform)
        ibn = bool(ps and ps.ibn)

        class _Chain(nn.Module):
            @nn.compact
            def __call__(self, feats):
                fpn = retina_mod.RetinaNetNeck(dtype=dtype, norm=norm,
                                               name="fpn")
                sepc = SEPCFPN(pconv_num=pconv_num,
                               pconv_deform=pconv_deform,
                               lcconv_deform=lcconv_deform,
                               ibn=ibn, dtype=dtype, name="sepc")
                return sepc(fpn(feats))

        self.module = _Chain(name="neck")


class RetinaNetHeadWithBNWithSEPC:
    """Combined-feature retina head (reference models/sepc/builder.py:53)."""

    def __init__(self, pRpn):
        from simpledet_tpu.models.sepc import SEPCRetinaNetHead
        p = patch_config_as_nothrow(pRpn)
        p.dtype = _dtype(p)
        self.p = p
        self.impl = SEPCRetinaNetHead(p)


class FCOSFPNNeck(RetinaNetNeck):
    """P3-P7 neck with P6 sourced from P5 (reference models/FCOS/builder.py
    FCOSFPNNeck, :399-423)."""

    def __init__(self, pNeck):
        from simpledet_tpu.models import retinanet as retina_mod
        p = patch_config_as_nothrow(pNeck)
        self.p = p
        self.module = retina_mod.RetinaNetNeck(dtype=_dtype(p),
                                               p6_source="p5", name="neck")


class FCOSFPNHead:
    def __init__(self, pRpn):
        from simpledet_tpu.models import fcos as fcos_mod
        p = patch_config_as_nothrow(pRpn)
        p.dtype = _dtype(p)
        self.p = p
        self.impl = fcos_mod.FCOSHead(p)


class FCOSDetector:
    """FCOS uses the RPN detector singleton in the reference; here a
    dedicated assembly returning the FCOS module."""

    @staticmethod
    def _assemble(backbone, neck, head):
        from simpledet_tpu.models.fcos import FCOS as Module
        return Module(backbone=backbone.module, neck=neck.module,
                      head_module=head.impl.module, head=head.impl)

    def get_train_symbol(self, backbone, neck, head):
        return self._assemble(backbone, neck, head)

    def get_test_symbol(self, backbone, neck, head):
        return self._assemble(backbone, neck, head)


def add_anchor_to_arg(*args, **kw):
    """No-op: anchors are constants folded into the jitted graph, not
    checkpoint weights (reference symbol/builder.py:904-938)."""
    return None
