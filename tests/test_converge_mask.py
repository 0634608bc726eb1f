"""Mask R-CNN convergence gate: the mask branch LEARNS SHAPES.

Trains config/converge_mask.py from scratch on a 16-image synthetic
ELLIPSE set over the 8-device CPU mesh (real CLI code paths), then
asserts segm AP >= 0.6 through mask_test — the in-env proxy for the
reference's MODEL_ZOO Mask R-CNN row (/root/reference/MODEL_ZOO.md:100,
37.1/33.7). Ellipse objects cap a box-filling mask head at segm IoU
~pi/4, so this gate fails if the mask branch merely copies boxes.
On one real chip the same recipe reaches box AP 0.96 / segm AP 0.934 /
segm AP75 1.0 at 480 steps (experiments/converge_curve.md).
"""
import os
import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.slow

DATA_ROOT = "/tmp/simpledet_converge_mask_ci"


@pytest.fixture(scope="module")
def converge_run():
    from tests.fixtures import make_micro_dataset
    shutil.rmtree(DATA_ROOT, ignore_errors=True)
    make_micro_dataset(DATA_ROOT, n_images=16, set_names=("converge_train",),
                       shapes="ellipse")
    os.environ["CONVERGE_DATA_ROOT"] = DATA_ROOT
    shutil.rmtree("experiments/converge_mask", ignore_errors=True)
    from detection_train import train_net
    hist = []
    train_net("config/converge_mask.py", loss_history=hist)
    yield hist


def test_loss_decreases(converge_run):
    tot = np.array([h["total_loss"] for h in converge_run])
    assert len(tot) >= 300
    assert np.isfinite(tot).all()
    assert tot[-20:].mean() < 0.5 * tot[:20].mean()


def test_overfits_to_segm_ap(converge_run):
    from mask_test import mask_test_net
    summaries = mask_test_net("config/converge_mask.py")
    assert summaries["bbox"]["AP"] >= 0.6, summaries["bbox"]
    assert summaries["segm"]["AP"] >= 0.6, summaries["segm"]
    assert summaries["segm"]["AP50"] >= 0.95, summaries["segm"]
