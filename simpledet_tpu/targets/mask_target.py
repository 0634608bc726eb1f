"""On-device mask targets: polygon rasterization inside the jitted graph.

TPU rewrite of the reference ProposalMaskTarget's polygon->mask step
(operator_cxx/proposal_mask_target.cc:20-96 convertPoly2MaskWithRatio, which
calls COCO rleFrPoly on the CPU inside the training graph): for each fg roi,
the matched gt's polygons are rasterized into a mask_size x mask_size grid
spanning the roi. Here rasterization is an even-odd point-in-polygon test at
the grid cell centers, vectorized over (cells x edges) on the VPU/MXU — no
host roundtrip, fully differentiable-graph-compatible (targets are
stop-gradiented by the caller).

Polygons arrive as a fixed EDGE tensor (host packing by
data/mask_transforms.EncodeGtPoly): gt_poly [G, E, 5] rows of
(xa, ya, xb, yb, seg_id) in resized-image coords, padded with seg_id = -1.
Multi-segment instances are unioned per COCO semantics (rleMerge): a point
is inside if ANY segment's even-odd winding is odd — not the XOR over all
edges, which would subtract overlapping segments.
"""
import jax
import jax.numpy as jnp


def rasterize_edges(edges, roi, mask_size, num_seg=8):
    """Rasterize one instance's polygon edges within a roi window.

    edges: [E, 5] (xa, ya, xb, yb, seg_id), seg_id == -1 for padding.
    roi: [4] xyxy in the same coordinate space.
    Returns [mask_size, mask_size] float {0, 1}.
    """
    x1, y1, x2, y2 = roi[0], roi[1], roi[2], roi[3]
    w = jnp.maximum(x2 - x1, 1.0)
    h = jnp.maximum(y2 - y1, 1.0)
    grid = (jnp.arange(mask_size, dtype=jnp.float32) + 0.5) / mask_size
    ys = (y1 + grid * h)[:, None]                        # [M, 1]
    xs = (x1 + grid * w)[None, :]                        # [1, M]
    py = jnp.broadcast_to(ys, (mask_size, mask_size)).reshape(-1)  # [P]
    px = jnp.broadcast_to(xs, (mask_size, mask_size)).reshape(-1)

    xa, ya = edges[:, 0], edges[:, 1]
    xb, yb = edges[:, 2], edges[:, 3]
    seg = edges[:, 4]
    valid = seg >= 0

    # ray-to-+x crossing test per (point, edge)
    ya_ = ya[None, :]
    yb_ = yb[None, :]
    xa_ = xa[None, :]
    xb_ = xb[None, :]
    pyv = py[:, None]
    pxv = px[:, None]
    straddles = (ya_ <= pyv) != (yb_ <= pyv)             # [P, E]
    # x coordinate where the edge crosses the horizontal line y = py
    t = (pyv - ya_) / jnp.where(yb_ == ya_, 1.0, yb_ - ya_)
    x_cross = xa_ + t * (xb_ - xa_)
    cross = straddles & (pxv < x_cross) & valid[None, :]  # [P, E]

    # per-segment odd winding, then union over segments
    seg_onehot = jax.nn.one_hot(seg.astype(jnp.int32), num_seg,
                                dtype=jnp.float32)        # [E, S]
    counts = cross.astype(jnp.float32) @ seg_onehot       # [P, S]
    inside = jnp.any(jnp.mod(counts, 2.0) >= 1.0, axis=1)
    return inside.astype(jnp.float32).reshape(mask_size, mask_size)


def mask_target(rois, gt_index, fg_mask, gt_poly, *, mask_size=28, num_seg=8):
    """Single image. rois: [F, 4] fg-first sampled proposals (first rows);
    gt_index: [F] matched gt per roi (-1 for non-fg); fg_mask: [F] bool;
    gt_poly: [G, E, 5] edge tensor.

    Returns mask targets [F, mask_size, mask_size] float {0,1}; rows with
    fg_mask == False are -1 (ignore), matching the reference's convention of
    only the first image_roi*fg_fraction rows being supervised
    (models/maskrcnn/builder.py:205-220).
    """
    idx = jnp.clip(gt_index, 0, gt_poly.shape[0] - 1)
    edges = gt_poly[idx]                                  # [F, E, 5]
    masks = jax.vmap(
        lambda e, r: rasterize_edges(e, r, mask_size, num_seg))(edges, rois)
    return jnp.where(fg_mask[:, None, None], masks, -1.0)


def batched_mask_target(rois, gt_index, fg_mask, gt_poly, **kw):
    """vmapped over images."""
    return jax.vmap(lambda r, i, f, p: mask_target(r, i, f, p, **kw))(
        rois, gt_index, fg_mask, gt_poly)
