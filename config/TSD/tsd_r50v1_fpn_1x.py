"""TSD Faster R-CNN (reference config/TSD/)."""
from simpledet_tpu.config_templates import faster_fpn_config


def get_config(is_train):
    from models.TSD.bbox_head import TSDConvFCBBoxHead
    from models.TSD.faster_rcnn import TSDFasterRcnn

    def bbox_head(pBbox):
        pBbox.roi_size = 7
        pBbox.TSD = type("TSD", (), dict(
            pc_cls=True, pc_reg=True, pc_cls_margin=0.2, pc_reg_margin=0.2,
            num_shared_convs=0, num_shared_fcs=2, num_cls_fcs=0,
            num_reg_fcs=0, conv_out_channels=256, fc_out_channels=1024))
        return TSDConvFCBBoxHead(pBbox)

    return faster_fpn_config(is_train, __name__, depth=50,
                             bbox_head=bbox_head, detector=TSDFasterRcnn)
