"""Anchor generation with exact parity to the reference's rounding.

Mirrors AnchorTarget2D.base_anchor (reference core/detection_input.py:374-400)
and add_anchor_to_arg (reference symbol/builder.py:904-938): the base anchor is
the stride x stride square at the origin; aspect widths are np.round'ed BEFORE
scaling, which is a quirk that must be preserved for mAP parity.

Anchors are host-side constants (numpy) folded into the jitted graph.
"""
import numpy as np


def generate_base_anchors(stride, scales, aspects):
    """[A, 4] base anchors for one stride. A = len(aspects) * len(scales).

    Order matches the reference: aspect-major, scale-minor (np.outer(ratios, scales)).
    """
    scales = np.array(scales, dtype=np.float64).reshape(-1)
    aspects = np.array(aspects, dtype=np.float64).reshape(-1)

    base = np.array([0, 0, stride - 1, stride - 1], dtype=np.float64)
    w = base[2] - base[0] + 1
    h = base[3] - base[1] + 1
    x_ctr = base[0] + 0.5 * (w - 1)
    y_ctr = base[1] + 0.5 * (h - 1)

    w_ratios = np.round(np.sqrt(w * h / aspects))
    h_ratios = np.round(w_ratios * aspects)
    ws = np.outer(w_ratios, scales).reshape(-1)
    hs = np.outer(h_ratios, scales).reshape(-1)

    anchors = np.stack(
        [x_ctr - 0.5 * (ws - 1),
         y_ctr - 0.5 * (hs - 1),
         x_ctr + 0.5 * (ws - 1),
         y_ctr + 0.5 * (hs - 1)],
        axis=1)
    return anchors.astype(np.float32)


def generate_anchor_grid(height, width, stride, scales, aspects):
    """Full anchor grid [H*W*A, 4] in row-major (y, x, anchor) order.

    Matches the reference grid enumeration (core/detection_input.py:402-438):
    shift grid built from meshgrid(shift_x, shift_y) then reshape(-1) gives
    y-major traversal; anchors for one cell are contiguous.
    """
    base = generate_base_anchors(stride, scales, aspects)
    shift_x = np.arange(0, width, dtype=np.float32) * stride
    shift_y = np.arange(0, height, dtype=np.float32) * stride
    grid_x, grid_y = np.meshgrid(shift_x, shift_y)
    grid = np.stack([grid_x.reshape(-1), grid_y.reshape(-1),
                     grid_x.reshape(-1), grid_y.reshape(-1)], axis=1)
    all_anchors = grid[:, None, :] + base[None, :, :]
    return all_anchors.reshape(-1, 4).astype(np.float32)


def generate_retinanet_base_anchors(stride, scales, aspects):
    """RetinaNet-convention base anchors (no rounding; centered on stride/2 square).

    Mirrors models/retinanet/input.py anchor generation in the reference, which
    uses the same rounded generator; kept as alias for now.
    """
    return generate_base_anchors(stride, scales, aspects)
