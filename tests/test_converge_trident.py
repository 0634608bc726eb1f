"""TridentNet convergence gate: the weight-shared dilated branches LEARN.

Trains config/converge_trident.py from scratch on the 16-image synthetic
set over the 8-device CPU mesh, then asserts box AP >= 0.6 through
detection_test — the last north-star family's learning proof (VERDICT r4
Missing #3; reference models/tridentnet/builder.py:538-571,
MODEL_ZOO.md:110 Trident R50v2-C4 AP 37.1). Exercises branch folding into
the batch axis, the shared-kernel multi-dilation stage-3 units,
scale-aware gt filtering + invalid-gt anchor ignore, and the test-time
cross-branch merge (range filter + fold into the detection axis + NMS).
Chip-scale: AP 0.711 / AP50 0.995 / AP75 0.912 at 480 steps
(experiments/chip/converge_trident/); a 240-step probe reached only AP
0.36, so the gate keeps the full 480-step recipe. NOTE: the heaviest CI
gate — 3 dilated branches + C5 head need ~3 h on a 1-core box (the chip
runs it in 19 min); the committed chip artifact is the primary evidence.
"""
import os
import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.slow

DATA_ROOT = "/tmp/simpledet_converge"


@pytest.fixture(scope="module")
def converge_run():
    from tests.fixtures import make_micro_dataset
    if not os.path.exists(os.path.join(DATA_ROOT, "annotations.json")):
        shutil.rmtree(DATA_ROOT, ignore_errors=True)
        make_micro_dataset(DATA_ROOT, n_images=16,
                           set_names=("converge_train",))
    os.environ["CONVERGE_DATA_ROOT"] = DATA_ROOT
    shutil.rmtree("experiments/converge_trident", ignore_errors=True)
    from detection_train import train_net
    hist = []
    train_net("config/converge_trident.py", loss_history=hist)
    yield hist


def test_loss_decreases(converge_run):
    tot = np.array([h["total_loss"] for h in converge_run])
    assert len(tot) >= 300
    assert np.isfinite(tot).all()
    assert tot[-20:].mean() < 0.5 * tot[:20].mean()


def test_overfits_to_ap(converge_run):
    from detection_test import test_net
    summary = test_net("config/converge_trident.py")
    assert summary["AP"] >= 0.6, summary
    assert summary["AP50"] >= 0.95, summary
