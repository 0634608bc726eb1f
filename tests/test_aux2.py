"""Aux batch 2: operator_py shims, QAT fake-quant, pretrain converter,
summary writer."""
import os

import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax
import jax.numpy as jnp


def test_operator_py_nms_shims():
    from operator_py.nms import py_nms_wrapper, py_weighted_nms, set_nms

    dets = np.array([[0, 0, 10, 10, 0.9],
                     [1, 1, 11, 11, 0.8],
                     [50, 50, 60, 60, 0.7]], np.float32)
    keep = py_nms_wrapper(0.5)(dets)
    assert set(keep) == {0, 2}

    dets6 = np.concatenate([dets, np.array([[5], [5], [7]])], 1)
    out = set_nms(dets6, 0.5)
    assert len(out) == 3    # same set -> no suppression

    voted = py_weighted_nms(dets, 0.5, 0.6)
    assert voted.shape[1] == 5


def test_operator_py_bbox_shims():
    from operator_py.bbox_transform import (bbox_overlaps_py, clip_boxes,
                                            nonlinear_pred,
                                            nonlinear_transform)

    boxes = np.array([[0, 0, 10, 10]], np.float32)
    gt = np.array([[2, 2, 12, 12]], np.float32)
    t = nonlinear_transform(boxes, gt)
    rec = nonlinear_pred(boxes, t)
    np.testing.assert_allclose(rec, gt, atol=1e-4)
    iou = bbox_overlaps_py(boxes, gt)
    assert 0 < iou[0, 0] < 1
    clipped = clip_boxes(np.array([[5, 5, 100, 100]], np.float32), (20, 30))
    np.testing.assert_allclose(clipped, [[5, 5, 29, 19]])


def test_fake_quant_straight_through():
    from simpledet_tpu.ops.quant import QuantConv, fake_quant

    x = jnp.linspace(-1, 1, 16)
    q = fake_quant(x, 8)
    assert np.abs(np.asarray(q) - np.asarray(x)).max() < 1 / 127 + 1e-6
    # 255 distinct levels max
    assert len(np.unique(np.asarray(q))) <= 255
    # straight-through gradient
    g = jax.grad(lambda a: jnp.sum(fake_quant(a, 8) ** 2))(x)
    np.testing.assert_allclose(np.asarray(g), 2 * np.asarray(fake_quant(x, 8)),
                               atol=1e-5)

    rng = np.random.RandomState(0)
    m = QuantConv(features=4, kernel_size=(3, 3))
    inp = jnp.asarray(rng.randn(1, 8, 8, 2), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), inp)
    y = m.apply(v, inp)
    assert y.shape == (1, 8, 8, 4)
    grads = jax.grad(lambda p: jnp.sum(m.apply(p, inp) ** 2))(v)
    gn = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gn) and gn > 0


def test_convert_torchvision_resnet_maps_and_folds():
    from utils.convert_pretrain import convert_torchvision_resnet

    rng = np.random.RandomState(0)
    npz = {
        "conv1.weight": rng.randn(64, 3, 7, 7).astype(np.float32),
        "bn1.weight": np.ones(64, np.float32) * 2,
        "bn1.bias": np.zeros(64, np.float32),
        "bn1.running_mean": np.ones(64, np.float32),
        "bn1.running_var": np.ones(64, np.float32) * 4,
        "layer1.0.conv1.weight": rng.randn(64, 64, 1, 1).astype(np.float32),
        "layer1.0.bn1.weight": np.ones(64, np.float32),
        "layer1.0.bn1.bias": np.zeros(64, np.float32),
        "layer1.0.bn1.running_mean": np.zeros(64, np.float32),
        "layer1.0.bn1.running_var": np.ones(64, np.float32),
        "fc.weight": rng.randn(1000, 2048).astype(np.float32),
    }
    p = convert_torchvision_resnet(npz)
    assert p["backbone"]["conv0"]["kernel"].shape == (7, 7, 3, 64)
    # scale = 2/sqrt(4+eps) = 1, bias = 0 - mean*scale = -1
    np.testing.assert_allclose(p["backbone"]["bn0"]["scale"], 1.0, atol=1e-3)
    np.testing.assert_allclose(p["backbone"]["bn0"]["bias"], -1.0, atol=1e-3)
    assert "stage1_unit1" in p["backbone"]
    assert "fc" not in str(p.keys())


def test_summary_writer(tmp_path):
    from simpledet_tpu.utils.logger import SummaryWriter

    w = SummaryWriter(str(tmp_path))
    w.add_scalar("train/loss", 1.5, 10)
    w.add_scalar("train/loss", 1.2, 20)
    w.close()
    import json
    lines = [json.loads(line) for line in
             open(os.path.join(str(tmp_path), "events.jsonl"))]
    assert lines[0]["tag"] == "train/loss" and lines[1]["step"] == 20


def test_syncbn_global_batch_stats():
    """SyncBN normalizes by full-batch stats (== reference cross-device BN)."""
    import jax
    import jax.numpy as jnp

    from simpledet_tpu.models.norm import SyncBN, normalizer_factory

    rng = np.random.RandomState(0)
    x = rng.randn(8, 4, 4, 16).astype(np.float32) * 3 + 1
    mod = SyncBN()
    params = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    y = np.asarray(mod.apply(params, jnp.asarray(x)))
    mean = x.mean(axis=(0, 1, 2))
    var = x.var(axis=(0, 1, 2))
    ref = (x - mean) / np.sqrt(var + 1e-5)  # fresh gamma=1, beta=0
    np.testing.assert_allclose(y, ref, rtol=2e-4, atol=2e-4)
    assert normalizer_factory(type="syncbn").type == "syncbn"


def test_infer_speed_cli(monkeypatch, capsys):
    """detection_infer_speed runs end-to-end on the micro config."""
    import sys

    import detection_infer_speed
    monkeypatch.setattr(sys, "argv", [
        "detection_infer_speed.py", "--config", "config/micro_test.py",
        "--shape", "64", "96", "--count", "2"])
    detection_infer_speed.main()
    out = capsys.readouterr().out
    assert "ms per image" in out and "img/s" in out


def test_visualize_batch(tmp_path):
    """Loader-batch visualizer writes overlay PNGs (debug hook)."""
    from simpledet_tpu.utils.visualize import (visualize_batch,
                                               visualize_detections)
    rng = np.random.RandomState(0)
    batch = {
        "data": rng.rand(2, 64, 96, 3).astype(np.float32),
        "gt_bbox": np.asarray([[[10, 10, 50, 40, 2], [-1] * 5],
                               [[5, 5, 30, 30, 1], [40, 20, 90, 60, 3]]],
                              np.float32),
    }
    paths = visualize_batch(batch, str(tmp_path))
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)
    import cv2
    img = cv2.imread(paths[0])
    assert img.shape == (64, 96, 3)
    out = visualize_detections(
        (batch["data"][0] * 255).astype(np.uint8),
        np.asarray([[10, 10, 50, 40]]), np.asarray([0.9]), np.asarray([1]),
        str(tmp_path / "det.png"))
    assert os.path.exists(out)
