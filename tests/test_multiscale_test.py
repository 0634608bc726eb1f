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


def test_flip_tta_valid_region_parity():
    """Flip-TTA mirrors only the valid region (ADVICE r3 medium): content
    stays top-left-aligned with im_info, so device_normalize's padding
    mask and the CLI's x -> w'-1-x un-flip both remain correct. The old
    whole-canvas flip right-aligned content — zeroing real pixels under
    the mask and shifting coords by canvas_W - w'."""
    import jax.numpy as jnp

    from simpledet_tpu.ops.image import device_normalize, flip_valid_region

    rng = np.random.RandomState(0)
    H, W = 32, 48                     # canvas wider than both images
    h1, w1 = 24, 30
    h2, w2 = 30, 40
    data = np.zeros((2, H, W, 3), np.uint8)
    data[0, :h1, :w1] = rng.randint(1, 255, (h1, w1, 3))
    data[1, :h2, :w2] = rng.randint(1, 255, (h2, w2, 3))
    im_info = np.array([[h1, w1, 1.0], [h2, w2, 1.0]], np.float32)

    flipped = flip_valid_region(data, im_info)
    for b, (hh, ww) in enumerate([(h1, w1), (h2, w2)]):
        # content mirrored within the valid region, still top-left aligned
        assert np.array_equal(flipped[b, :hh, :ww],
                              data[b, :hh, :ww][:, ::-1])
        assert np.all(flipped[b, :, ww:] == 0)
        assert np.all(flipped[b, hh:] == 0)

    # normalized flipped == mirror of normalized original on the valid
    # region; the padded border must still be exactly zero
    mean, std = (120.0, 115.0, 100.0), (58.0, 57.0, 57.0)
    n0 = np.asarray(device_normalize(
        jnp.asarray(data), jnp.asarray(im_info), mean, std))
    nf = np.asarray(device_normalize(
        jnp.asarray(flipped), jnp.asarray(im_info), mean, std))
    for b, (hh, ww) in enumerate([(h1, w1), (h2, w2)]):
        np.testing.assert_allclose(nf[b, :hh, :ww],
                                   n0[b, :hh, :ww][:, ::-1], atol=1e-5)
        assert np.all(nf[b, :, ww:] == 0) and np.all(nf[b, hh:] == 0)

    # un-flip math: an object spanning [x1,x2] appears at
    # [w'-1-x2, w'-1-x1] after the region flip; the CLI inverse recovers it
    x1, x2 = 5.0, 17.0
    fx1, fx2 = w1 - 1 - x2, w1 - 1 - x1
    assert (w1 - 1 - fx2, w1 - 1 - fx1) == (x1, x2)


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
