"""RepPoints point-set ops — jnp rewrite of models/RepPoints/point_ops.py.

The reference wrote these in symbolic mx ops (shape-static), so the port is
direct: offsets grid for the deformable conv, per-level location centers,
offset->point / point->box transforms (minmax / partial_minmax / moment),
point assignment (k-nearest in the matching pyramid level) and IoU
assignment. Self-tested against the reference's own __main__ fixtures
(point_ops.py:283-322) in tests/test_reppoints.py.
"""
import jax
import jax.numpy as jnp
import numpy as np

from simpledet_tpu.ops.bbox import bbox_overlaps

INF = 1e10


def gen_dcn_offsets(dcn_kernel=3, dcn_pad=1):
    """[1, 1, 2*K*K] base (y, x) offsets of the regular conv grid."""
    base = np.arange(-dcn_pad, dcn_pad + 1, dtype=np.float32)
    yy = np.repeat(base, dcn_kernel)
    xx = np.tile(base, dcn_kernel)
    return np.stack([yy, xx], 1).reshape(1, 1, -1)


def gen_points(fh, fw, stride):
    """[fh*fw, 3] (x, y, stride) location centers (reference _gen_points)."""
    x = np.arange(fw, dtype=np.float32) * stride
    y = np.arange(fh, dtype=np.float32) * stride
    gx, gy = np.meshgrid(x, y)
    s = np.full_like(gx.reshape(-1), stride)
    return np.stack([gx.reshape(-1), gy.reshape(-1), s], 1)


def offset_to_pts(center, pred, stride, num_points):
    """center [N, 3], pred [N, 2*num_points] (y-first pairs) ->
    pts [N, 2*num_points] (x-first pairs) in image coords."""
    xy = jnp.tile(center[:, :2], (1, num_points))
    p = pred.reshape(-1, num_points, 2)
    p = jnp.flip(p, axis=2).reshape(-1, num_points * 2)   # y,x -> x,y
    return p * stride + xy


def points2bbox(pts, transform="minmax", y_first=True, moment_transfer=None):
    """pts [..., 2*n] -> boxes [..., 4] (reference _points2bbox)."""
    shp = pts.shape
    p = pts.reshape(shp[:-1] + (shp[-1] // 2, 2))
    if y_first:
        py, px = p[..., 0], p[..., 1]
    else:
        px, py = p[..., 0], p[..., 1]

    if transform in ("minmax", "partial_minmax"):
        if transform == "partial_minmax":
            px, py = px[..., :4], py[..., :4]
        return jnp.stack([jnp.min(px, -1), jnp.min(py, -1),
                          jnp.max(px, -1), jnp.max(py, -1)], -1)
    if transform == "moment":
        mx_ = jnp.mean(px, -1)
        my = jnp.mean(py, -1)
        sx = jnp.sqrt(jnp.mean((px - mx_[..., None]) ** 2, -1))
        sy = jnp.sqrt(jnp.mean((py - my[..., None]) ** 2, -1))
        half_w = sx * jnp.exp(moment_transfer[0])
        half_h = sy * jnp.exp(moment_transfer[1])
        return jnp.stack([mx_ - half_w, my - half_h,
                          mx_ + half_w, my + half_h], -1)
    raise NotImplementedError(transform)


def point_assign(points, gt_boxes, scale, num_pos):
    """Reference _point_assign (point_ops.py:67-137).

    points [N, 3]; gt_boxes [G, 5] (padded class <= 0 treated invalid).
    Returns (label [N] {-1 unassigned, k class}, gts [N, 4])."""
    px, py, pstride = points[:, 0], points[:, 1], points[:, 2]
    plvl = jnp.floor(jnp.log2(pstride))
    lvl_min, lvl_max = jnp.min(plvl), jnp.max(plvl)

    gl, gt_, gr, gb, gcls = (gt_boxes[:, i] for i in range(5))
    gx = (gl + gr) / 2.0
    gy = (gt_ + gb) / 2.0
    gw = jnp.maximum(gr - gl, 1e-6)
    gh = jnp.maximum(gb - gt_, 1e-6)
    glvl = jnp.floor((jnp.log2(gw / scale) + jnp.log2(gh / scale)) / 2.0)
    glvl = jnp.clip(glvl, lvl_min, lvl_max)

    dx = (px[None, :] - gx[:, None]) / gw[:, None]
    dy = (py[None, :] - gy[:, None]) / gh[:, None]
    dist = jnp.sqrt(dx * dx + dy * dy)                     # [G, N]
    ok = (glvl[:, None] == plvl[None, :]) & (gcls > 0)[:, None]
    dist = jnp.where(ok, dist, INF)

    # keep only each gt's num_pos nearest points
    order = jnp.argsort(dist, axis=1)
    rank = jnp.zeros_like(dist, dtype=jnp.int32)
    rank = jax.vmap(lambda o: jnp.zeros(dist.shape[1], jnp.int32)
                    .at[o].set(jnp.arange(dist.shape[1], dtype=jnp.int32)))(
        order)
    dist = jnp.where(rank < num_pos, dist, INF)

    min_dist = jnp.min(dist, axis=0)
    min_idx = jnp.argmin(dist, axis=0)
    label = jnp.where(min_dist < INF, gcls[min_idx], -1.0)
    gts = jnp.where((min_dist < INF)[:, None],
                    gt_boxes[min_idx, :4], 0.0)
    return label, gts


def iou_assign(p_boxes, gt_boxes, pos_iou_thr, neg_iou_thr, min_pos_iou):
    """Reference _iou_assign (point_ops.py:140-176).

    Returns (label [N] {-1 ignore, 0 bg, k class}, gts [N, 4])."""
    gcls = gt_boxes[:, 4]
    gt_valid = gcls > 0
    iou = bbox_overlaps(p_boxes, gt_boxes[:, :4], legacy_plus_one=False)
    iou = jnp.where(gt_valid[None, :], iou, -1.0)
    max_iou = jnp.max(iou, axis=1)
    arg = jnp.argmax(iou, axis=1)
    max_p = jnp.max(iou, axis=0)                          # per gt

    assigned = jnp.full(p_boxes.shape[0], -1.0)
    assigned = jnp.where(max_iou < neg_iou_thr, 0.0, assigned)
    best_hit = jnp.any((iou == max_p[None, :]) & (max_p > min_pos_iou)[None, :]
                       & gt_valid[None, :], axis=1)
    assigned = jnp.where(best_hit, 1.0, assigned)
    assigned = jnp.where(max_iou >= pos_iou_thr, 1.0, assigned)

    label = jnp.where(assigned > 0, gcls[arg], assigned)
    gts = jnp.where((assigned > 0)[:, None], gt_boxes[arg, :4], 0.0)
    return label, gts
