"""rpn_r50v1_fpn_1x — RPN-only proposal model (reference
config/rpn_r50v1_fpn_1x.py): same Faster R-CNN RPN stack, RPN detector."""
from simpledet_tpu.config_templates import faster_fpn_config


def get_config(is_train):
    from symbol.builder import RPN

    class _RpnDetector(RPN):
        # adapt the 5-arg template call to the 3-arg RPN assembly
        def get_train_symbol(self, backbone, neck, rpn_head, roi_extractor,
                             bbox_head):
            return RPN._assemble(backbone, neck, rpn_head)

        def get_test_symbol(self, backbone, neck, rpn_head, roi_extractor,
                            bbox_head):
            return RPN._assemble(backbone, neck, rpn_head)

        def get_rpn_test_symbol(self, backbone, neck, rpn_head):
            return RPN._assemble(backbone, neck, rpn_head)

    return faster_fpn_config(is_train, __name__, depth=50,
                             detector=_RpnDetector)
