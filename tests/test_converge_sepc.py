"""sepc convergence gate: the family LEARNS (VERDICT r4 Weak #3).

Trains config/converge_sepc.py from scratch on the 16-image synthetic
set over the 8-device CPU mesh, then asserts box AP >= 0.6 through
detection_test. See the config docstring for the exact machinery gated.
Chip-scale: AP 0.969 / AP50 0.977 (experiments/chip/converge_sepc/).
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
    shutil.rmtree("experiments/converge_sepc", ignore_errors=True)
    from detection_train import train_net
    hist = []
    train_net("config/converge_sepc.py", loss_history=hist)
    yield hist


def test_loss_decreases(converge_run):
    tot = np.array([h["total_loss"] for h in converge_run])
    assert len(tot) >= 300
    assert np.isfinite(tot).all()
    assert tot[-20:].mean() < 0.6 * tot[:20].mean()


def test_overfits_to_ap(converge_run):
    from detection_test import test_net
    summary = test_net("config/converge_sepc.py")
    assert summary["AP"] >= 0.6, summary
    assert summary["AP50"] >= 0.9, summary
