"""INT8 QAT convergence gate (VERDICT r3 Missing #4 / next-round #6).

Trains the converge_test flagship recipe WITH fake-quant (conv/dense io +
kernels) for the same 200 steps as the fp32 CI gate and asserts the same
overfit bar: AP >= 0.6 — i.e. within 0.1 absolute of the fp32 run's
measured 0.70. A QAT wiring bug (wrong minmax, broken STE, quantizing the
loss path) would stall learning and fail this where the old 4-iteration
loss-band check could not.
"""
import os
import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.slow

DATA_ROOT = "/tmp/simpledet_converge"
EPOCHS = "50"   # 4 iters/epoch -> 200 steps, matching tests/test_convergence


@pytest.fixture(scope="module")
def converge_run():
    from tests.fixtures import make_micro_dataset
    if not os.path.exists(os.path.join(DATA_ROOT, "annotations.json")):
        shutil.rmtree(DATA_ROOT, ignore_errors=True)
        make_micro_dataset(DATA_ROOT, n_images=16,
                           set_names=("converge_train",))
    os.environ["CONVERGE_DATA_ROOT"] = DATA_ROOT
    prev = {k: os.environ.get(k) for k in
            ("CONVERGE_BATCH", "CONVERGE_EPOCHS")}
    os.environ["CONVERGE_BATCH"] = "1"
    os.environ["CONVERGE_EPOCHS"] = EPOCHS
    shutil.rmtree("experiments/converge_int8", ignore_errors=True)
    from detection_train import train_net
    hist = []
    try:
        train_net("config/converge_int8.py", loss_history=hist)
        yield hist
    finally:
        for k, v in prev.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def test_qat_loss_decreases(converge_run):
    tot = np.array([h["total_loss"] for h in converge_run])
    assert len(tot) >= 150
    assert np.isfinite(tot).all()
    assert tot[-20:].mean() < 0.5 * tot[:20].mean()


def test_qat_overfits_to_ap(converge_run):
    from detection_test import test_net
    summary = test_net("config/converge_int8.py")
    assert summary["AP"] >= 0.6, summary
    assert summary["AP50"] >= 0.95, summary
