import numpy as np
import jax
import jax.numpy as jnp

from simpledet_tpu.targets.proposal_target import proposal_target
from tests.oracles import np_bbox_overlaps, np_encode

PT_KW = dict(image_rois=32, fg_fraction=0.25, fg_thr=0.5, bg_thr_hi=0.5,
             bg_thr_lo=0.0, num_reg_class=5)


def make_rois(seed, n=60, num_gt=4, max_gt=8, size=300):
    rng = np.random.RandomState(seed)
    gt = np.full((max_gt, 5), -1, dtype=np.float32)
    for i in range(num_gt):
        x1, y1 = rng.uniform(0, size - 100, 2)
        gt[i] = [x1, y1, x1 + rng.uniform(30, 90), y1 + rng.uniform(30, 90),
                 rng.randint(1, 5)]
    rois = np.zeros((n, 4), dtype=np.float32)
    k = n - 10  # last 10 rows stay zero-padding
    for i in range(k):
        if i < k // 2:  # jittered copies of gt -> likely fg
            g = gt[rng.randint(0, num_gt)]
            jit = rng.uniform(-10, 10, 4)
            rois[i] = [g[0] + jit[0], g[1] + jit[1],
                       max(g[2] + jit[2], g[0] + jit[0] + 5),
                       max(g[3] + jit[3], g[1] + jit[1] + 5)]
        else:
            x1, y1 = rng.uniform(0, size - 60, 2)
            rois[i] = [x1, y1, x1 + rng.uniform(10, 50), y1 + rng.uniform(10, 50)]
    rois = np.maximum(rois, 0)
    rois[:, 3] = np.maximum(rois[:, 3], 1.0)  # valid rows must have y2 > 0
    rois[k:] = 0
    return rois, gt


def run_pt(rois, gt, seed=0, **over):
    kw = dict(PT_KW, **over)
    return jax.jit(lambda r, g: proposal_target(
        jax.random.PRNGKey(seed), r, g, deterministic=True, output_iou=True, **kw)
    )(jnp.asarray(rois), jnp.asarray(gt))


def test_proposal_target_semantics():
    rois, gt = make_rois(0)
    out = run_pt(rois, gt)
    label = np.asarray(out["label"])
    fg_mask = np.asarray(out["fg_mask"])
    sel_rois = np.asarray(out["rois"])
    iou = np.asarray(out["match_gt_iou"])

    # fg-first layout, fg count <= image_rois * fg_fraction
    n_fg = fg_mask.sum()
    assert n_fg <= 8
    assert fg_mask[:n_fg].all() and not fg_mask[n_fg:].any()
    # all fg labels are the matched gt class; bg labels 0
    assert (label[:n_fg] > 0).all()
    assert (label[n_fg:] == 0).all()

    # check fg/bg IoU thresholds against an oracle IoU computation
    valid_gt = gt[gt[:, 4] != -1]
    ov = np_bbox_overlaps(sel_rois, valid_gt[:, :4])
    mx = ov.max(axis=1)
    np.testing.assert_allclose(mx, iou, rtol=1e-4, atol=1e-4)
    assert (mx[:n_fg] >= 0.5 - 1e-6).all()
    assert (mx[n_fg:] < 0.5).all()

    # fg regression targets: encode(roi, matched gt) / std at class slot
    tgt = np.asarray(out["bbox_target"]).reshape(32, 5, 4)
    wgt = np.asarray(out["bbox_weight"]).reshape(32, 5, 4)
    for i in range(n_fg):
        c = int(label[i])
        j = ov[i].argmax()
        want = np_encode(sel_rois[i:i + 1], valid_gt[j:j + 1, :4])[0]
        want = want / np.array([0.1, 0.1, 0.2, 0.2])
        np.testing.assert_allclose(tgt[i, c], want, rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(wgt[i, c], 1.0)
        # other class slots zero
        wz = wgt[i].copy()
        wz[c] = 0
        assert wz.sum() == 0
    assert wgt[n_fg:].sum() == 0


def test_proposal_target_appends_gt():
    # proposals far away from gt; with gt append the gt themselves become fg
    rois = np.zeros((16, 4), np.float32)
    rois[:8] = [200, 200, 240, 240]
    gt = np.full((4, 5), -1, np.float32)
    gt[0] = [10, 10, 50, 50, 3]
    out = run_pt(rois, gt)
    n_fg = int(np.asarray(out["fg_mask"]).sum())
    assert n_fg == 1
    np.testing.assert_allclose(np.asarray(out["rois"])[0], gt[0, :4])
    assert np.asarray(out["label"])[0] == 3
    out2 = run_pt(rois, gt, proposal_wo_gt=True)
    assert np.asarray(out2["fg_mask"]).sum() == 0


def test_proposal_target_class_agnostic():
    rois, gt = make_rois(1)
    out = run_pt(rois, gt, class_agnostic=True, num_reg_class=2)
    tgt = np.asarray(out["bbox_target"]).reshape(32, 2, 4)
    n_fg = int(np.asarray(out["fg_mask"]).sum())
    assert n_fg > 0
    assert np.abs(tgt[:n_fg, 1]).sum() > 0
    assert np.abs(tgt[:, 0]).sum() == 0


def test_proposal_target_no_gt():
    rois, _ = make_rois(2)
    gt = np.full((8, 5), -1, np.float32)
    out = run_pt(rois, gt)
    assert np.asarray(out["fg_mask"]).sum() == 0
    assert (np.asarray(out["label"]) == 0).all()
    assert np.asarray(out["bbox_weight"]).sum() == 0
    # rois are filled from the valid pool (wrapping), not all zero
    assert np.abs(np.asarray(out["rois"])).sum() > 0


def test_proposal_target_fills_exact_count():
    rois, gt = make_rois(3, n=200, num_gt=6)
    out = run_pt(rois, gt)
    sel = np.asarray(out["rois"])
    assert sel.shape == (32, 4)
    # every row is a real box (y2 > 0) since the pool is large
    assert (sel[:, 3] > 0).all()
