"""Multi-scale + flip test-time aggregation through the real test CLI."""
import os
import shutil

import numpy as np
import pytest

import tests.conftest  # noqa: F401

DATA_ROOT = "/tmp/simpledet_micro_ms"


@pytest.fixture(scope="module")
def micro_data():
    from tests.fixtures import make_micro_dataset
    shutil.rmtree(DATA_ROOT, ignore_errors=True)
    os.makedirs(DATA_ROOT, exist_ok=True)
    roidb, ann = make_micro_dataset(DATA_ROOT, n_images=6)
    os.environ["MICRO_DATA_ROOT"] = DATA_ROOT
    yield roidb, ann


def test_multiscale_flip_eval(micro_data):
    """Patch the micro config with scales+flip; pipeline must produce a
    finite summary (random weights)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "micro_ms", "config/micro_test.py")
    base = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(base)

    cfg_path = os.path.join(DATA_ROOT, "micro_ms_config.py")
    with open("config/micro_test.py") as f:
        src = f.read()
    src = src.replace(
        "class TestParam:\n        min_det_score = 0.01",
        "class TestParam:\n        scales = [(96, 144), (128, 192)]\n"
        "        flip = True\n        min_det_score = 0.01")
    with open(cfg_path, "w") as f:
        f.write(src)

    from detection_test import test_net
    summary = test_net(cfg_path, max_images=3)
    assert summary is not None
    assert np.isfinite(summary["AP"])
