"""End-to-end train + eval on the synthetic micro dataset (CPU).

The TPU analog of the reference's metric-parity integration testing: run the
real CLI code paths (detection_train.train_net, detection_test.test_net) on
a micro config and check losses are finite, checkpoints round-trip, and the
eval pipeline produces a COCO summary.
"""
import os
import shutil

import numpy as np
import pytest

from tests.fixtures import make_micro_dataset

DATA_ROOT = "/tmp/simpledet_micro"


@pytest.fixture(scope="module")
def micro_data():
    shutil.rmtree(DATA_ROOT, ignore_errors=True)
    os.makedirs(DATA_ROOT, exist_ok=True)
    roidb, ann = make_micro_dataset(DATA_ROOT, n_images=8)
    os.environ["MICRO_DATA_ROOT"] = DATA_ROOT
    yield roidb, ann


@pytest.fixture(scope="module")
def trained(micro_data):
    shutil.rmtree("experiments/micro_test", ignore_errors=True)
    from detection_train import train_net
    state = train_net("config/micro_test.py", max_iter_override=3)
    return state


def test_train_runs_and_checkpoints(trained):
    assert os.path.exists("experiments/micro_test/checkpoint-0001.params")
    leaves = [np.asarray(x) for x in
              __import__("jax").tree.leaves(trained.params)]
    assert all(np.isfinite(l).all() for l in leaves)


def test_eval_pipeline(trained, micro_data):
    from detection_test import test_net
    summary = test_net("config/micro_test.py")
    # random-init params -> tiny AP, but the protocol must produce the full
    # metric dict and a result json
    assert set(summary) == {"AP", "AP50", "AP75", "APs", "APm", "APl",
                            "AR1", "AR10", "AR100", "ARs", "ARm", "ARl"}
    assert os.path.exists("experiments/micro_test/micro_val_result.json")


def test_checkpoint_roundtrip(trained):
    import jax
    from simpledet_tpu.core.checkpoint import load_checkpoint
    params, opt_state, _step = load_checkpoint(
        "experiments/micro_test/checkpoint", 1, trained.params)
    a = jax.tree.leaves(trained.params)[0]
    b = jax.tree.leaves(params)[0]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_kd_teacher_train_e2e(trained):
    """KD config trains via the real CLI: the frozen teacher (micro_test
    checkpoint) produces teacher_label per batch and the fit loss is live
    (reference detection_train.py:172-184)."""
    import shutil as _sh
    _sh.rmtree("experiments/kd_micro_test", ignore_errors=True)
    from detection_train import train_net
    state = train_net("config/kd_micro_test.py", max_iter_override=2)
    assert os.path.exists("experiments/kd_micro_test/checkpoint-0001.params")
    # the student hint adapter must exist and have been updated
    import jax
    flat = {"/".join(map(str, k)): v for k, v in
            __import__("flax").traverse_util.flatten_dict(
                state.params).items()}
    hint = [k for k in flat if "student_hint_conv" in k]
    assert hint, sorted(flat)[:20]


def test_retina_single_stage_e2e(micro_data):
    """Single-stage CLI path: train 2 iters then COCO-eval via test_net."""
    import shutil as _sh
    _sh.rmtree("experiments/retina_micro_test", ignore_errors=True)
    from detection_train import train_net
    train_net("config/retina_micro_test.py", max_iter_override=2)
    assert os.path.exists(
        "experiments/retina_micro_test/checkpoint-0001.params")
    from detection_test import test_net
    summary = test_net("config/retina_micro_test.py", max_images=3)
    assert summary is not None and np.isfinite(summary["AP"])
