"""Convert a roidb/custom dataset into a COCO annotation dict for eval
(reference utils/contrib/data_to_coco.py). Thin wrapper over roidb_to_coco."""
import sys

sys.path.insert(0, ".")
from utils.roidb_to_coco import roidb_to_coco  # noqa: F401,E402
