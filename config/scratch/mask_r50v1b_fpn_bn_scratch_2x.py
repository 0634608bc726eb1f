"""mask_r50v1b_fpn_bn_scratch_2x (reference config/scratch/): trained from
scratch with cross-replica (sync) BN."""
from simpledet_tpu.config_templates import mask_fpn_config


def get_config(is_train):
    return mask_fpn_config(is_train, __name__, depth=50, variant="v1b",
                           schedule_mult=2, norm_type="syncbn",
                           from_scratch=True)
