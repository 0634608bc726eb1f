"""KD effectiveness gate (VERDICT r4 next-round #6b): distillation must
HELP, not just run.

A converged converge_test checkpoint is the frozen teacher. Two fresh
students train for the SAME short budget — one with the c4 FitNet hint
loss, one without — and the distilled student must reach higher
train-set AP. This is the delta the reference's KDDetModule exists for
(models/KD/detection_module.py:48) and that a finite-loss e2e cannot see.
"""
import os
import shutil

import numpy as np
import pytest

pytestmark = pytest.mark.slow

DATA_ROOT = "/tmp/simpledet_converge"


@pytest.fixture(scope="module")
def kd_runs():
    from tests.fixtures import make_micro_dataset
    if not os.path.exists(os.path.join(DATA_ROOT, "annotations.json")):
        shutil.rmtree(DATA_ROOT, ignore_errors=True)
        make_micro_dataset(DATA_ROOT, n_images=16,
                           set_names=("converge_train",))
    os.environ["CONVERGE_DATA_ROOT"] = DATA_ROOT

    from detection_train import train_net

    # teacher: full converge_test recipe (reused if already trained by
    # tests/test_convergence.py in the same session)
    ck = "experiments/converge_test/checkpoint-0120.params"
    if not os.path.exists(ck):
        shutil.rmtree("experiments/converge_test", ignore_errors=True)
        train_net("config/converge_test.py")
    assert os.path.exists(ck)

    results = {}
    try:
        for mode, flag in (("solo", "0"), ("kd", "1")):
            os.environ["CONVERGE_KD_TEACHER"] = flag
            name = "converge_kd" if flag == "1" else "converge_kd_solo"
            shutil.rmtree(f"experiments/{name}", ignore_errors=True)
            hist = []
            train_net("config/converge_kd.py", loss_history=hist)
            from detection_test import test_net
            results[mode] = {"hist": hist,
                             "ap": test_net("config/converge_kd.py")["AP"]}
    finally:
        os.environ.pop("CONVERGE_KD_TEACHER", None)
    yield results


def test_losses_finite(kd_runs):
    for mode, r in kd_runs.items():
        tot = np.array([h["total_loss"] for h in r["hist"]])
        assert np.isfinite(tot).all(), mode
    assert any("fit_loss" in h for h in kd_runs["kd"]["hist"])
    assert not any("fit_loss" in h for h in kd_runs["solo"]["hist"])


def test_distilled_student_beats_solo(kd_runs):
    ap_kd, ap_solo = kd_runs["kd"]["ap"], kd_runs["solo"]["ap"]
    # equal steps, equal arch/init scheme; the hint loss must buy real AP
    assert ap_kd >= ap_solo + 0.05, (ap_kd, ap_solo)
