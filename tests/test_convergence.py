"""Convergence proof: the framework LEARNS, not just runs.

Trains the depth-18 FPN Faster R-CNN (config/converge_test.py) from
scratch on a 16-image synthetic set over the 8-device CPU mesh — the real
CLI code paths end to end — then asserts:

  * train-set detection AP >= 0.6 and AP50 >= 0.95 (overfit gate; the
    in-env proxy for the reference's MODEL_ZOO mAP regression suite,
    /root/reference/MODEL_ZOO.md:99 — measured 0.70/1.0 at 200 steps on
    the CPU mesh, 0.937/1.0 at 400 steps on a real chip);
  * RPN proposal recall@0.5 >= 0.95 via the rpn_test CLI;
  * windowed loss decrease (first-20-mean >> last-20-mean).

On one real TPU chip the same recipe reaches AP 0.937 / AP50 1.0 at
400 iters (experiments/converge_curve.md records the run).
"""
import os
import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.slow

DATA_ROOT = "/tmp/simpledet_converge"
EPOCHS = "50"   # 4 iters/epoch -> 200 steps


@pytest.fixture(scope="module")
def converge_run():
    from tests.fixtures import make_micro_dataset
    shutil.rmtree(DATA_ROOT, ignore_errors=True)
    make_micro_dataset(DATA_ROOT, n_images=16, set_names=("converge_train",))
    os.environ["CONVERGE_DATA_ROOT"] = DATA_ROOT
    os.environ["CONVERGE_BATCH"] = "1"
    os.environ["CONVERGE_EPOCHS"] = EPOCHS
    shutil.rmtree("experiments/converge_test", ignore_errors=True)
    from detection_train import train_net
    hist = []
    state = train_net("config/converge_test.py", loss_history=hist)
    yield state, hist


def test_loss_decreases(converge_run):
    _, hist = converge_run
    tot = np.array([h["total_loss"] for h in hist])
    assert len(tot) >= 150
    first = tot[:20].mean()
    last = tot[-20:].mean()
    assert np.isfinite(tot).all()
    assert last < 0.5 * first, (first, last)


def test_overfits_to_ap(converge_run):
    from detection_test import test_net
    summary = test_net("config/converge_test.py")
    assert summary["AP50"] >= 0.95, summary
    assert summary["AP"] >= 0.6, summary


def test_rpn_recall(converge_run):
    from rpn_test import rpn_test_net
    recalls = rpn_test_net("config/converge_test.py")
    best = max(recalls.values())
    assert best >= 0.95, recalls
