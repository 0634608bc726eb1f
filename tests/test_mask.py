"""Mask R-CNN family: on-device polygon rasterizer vs cv2 oracle, mask
target layout, and end-to-end train + segm eval on the micro dataset."""
import os
import shutil

import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp

DATA_ROOT = "/tmp/simpledet_micro_mask"


def test_rasterizer_matches_cv2_oracle():
    """Even-odd rasterization at cell centers vs cv2.fillPoly sampled at the
    same sub-pixel positions (boundary-pixel tolerance)."""
    import cv2

    from simpledet_tpu.data.mask_transforms import polys_to_edges
    from simpledet_tpu.targets.mask_target import rasterize_edges

    rng = np.random.RandomState(1)
    M = 28
    for trial in range(5):
        # random convex-ish polygon inside a 100x80 box
        n = rng.randint(3, 8)
        ang = np.sort(rng.uniform(0, 2 * np.pi, n))
        r = rng.uniform(15, 35, n)
        cx, cy = rng.uniform(40, 60), rng.uniform(30, 50)
        xs = cx + r * np.cos(ang)
        ys = cy + r * np.sin(ang)
        poly = np.stack([xs, ys], 1).reshape(-1).astype(np.float32)

        roi = np.array([cx - 40, cy - 30, cx + 40, cy + 30], np.float32)
        edges = polys_to_edges([poly], max_edges=16)
        got = np.asarray(rasterize_edges(jnp.asarray(edges),
                                         jnp.asarray(roi), M))

        # oracle: 10x supersampled cv2 raster, sampled at cell centers
        S = 10
        canvas = np.zeros((100 * S, 100 * S), np.uint8)
        pts = np.round(poly.reshape(-1, 2) * S).astype(np.int32)
        cv2.fillPoly(canvas, [pts], 1)
        gy = (roi[1] + (np.arange(M) + 0.5) / M * (roi[3] - roi[1]))
        gx = (roi[0] + (np.arange(M) + 0.5) / M * (roi[2] - roi[0]))
        yy = np.clip((gy * S).astype(int), 0, canvas.shape[0] - 1)
        xx = np.clip((gx * S).astype(int), 0, canvas.shape[1] - 1)
        oracle = canvas[np.ix_(yy, xx)].astype(np.float32)

        disagree = np.mean(got != oracle)
        assert disagree < 0.05, f"trial {trial}: {disagree:.3f} mismatch"


def test_multi_segment_union():
    """Two disjoint squares in one instance -> union, not XOR artifacts."""
    from simpledet_tpu.data.mask_transforms import polys_to_edges
    from simpledet_tpu.targets.mask_target import rasterize_edges

    sq1 = np.array([0, 0, 10, 0, 10, 10, 0, 10], np.float32)
    sq2 = np.array([20, 20, 30, 20, 30, 30, 20, 30], np.float32)
    edges = polys_to_edges([sq1, sq2], max_edges=16)
    roi = np.array([0, 0, 30, 30], np.float32)
    m = np.asarray(rasterize_edges(jnp.asarray(edges), jnp.asarray(roi), 30))
    assert m[5, 5] == 1 and m[25, 25] == 1 and m[15, 15] == 0


def test_mask_target_fg_first_layout():
    from simpledet_tpu.data.mask_transforms import polys_to_edges
    from simpledet_tpu.targets.mask_target import mask_target

    sq = np.array([10, 10, 50, 10, 50, 50, 10, 50], np.float32)
    gt_poly = np.stack([polys_to_edges([sq], 16),
                        np.full((16, 5), -1, np.float32)])
    rois = np.array([[10, 10, 50, 50], [0, 0, 20, 20]], np.float32)
    gt_index = np.array([0, -1])
    fg = np.array([True, False])
    t = np.asarray(mask_target(jnp.asarray(rois), jnp.asarray(gt_index),
                               jnp.asarray(fg), jnp.asarray(gt_poly),
                               mask_size=14))
    assert t.shape == (2, 14, 14)
    assert (t[0] == 1).mean() > 0.9      # roi == gt box -> nearly full mask
    assert (t[1] == -1).all()            # non-fg row ignored


@pytest.fixture(scope="module")
def micro_data():
    from tests.fixtures import make_micro_dataset
    shutil.rmtree(DATA_ROOT, ignore_errors=True)
    os.makedirs(DATA_ROOT, exist_ok=True)
    roidb, ann = make_micro_dataset(DATA_ROOT, n_images=8)
    os.environ["MICRO_DATA_ROOT"] = DATA_ROOT
    yield roidb, ann


def test_mask_e2e_train_and_segm_eval(micro_data):
    shutil.rmtree("experiments/mask_micro_test", ignore_errors=True)
    from detection_train import train_net
    state = train_net("config/mask_micro_test.py", max_iter_override=2)
    assert os.path.exists("experiments/mask_micro_test/checkpoint-0001.params")

    from mask_test import mask_test_net
    summaries = mask_test_net("config/mask_micro_test.py", max_images=4)
    assert summaries is not None
    assert "bbox" in summaries and "segm" in summaries
    assert np.isfinite(summaries["segm"]["AP"])
