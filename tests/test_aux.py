"""Aux subsystems: rpn_test CLI, LR schedules, BN folding, remat step."""
import os
import shutil

import numpy as np
import pytest

import tests.conftest  # noqa: F401

DATA_ROOT = "/tmp/simpledet_micro_aux"


@pytest.fixture(scope="module")
def micro_data():
    from tests.fixtures import make_micro_dataset
    shutil.rmtree(DATA_ROOT, ignore_errors=True)
    os.makedirs(DATA_ROOT, exist_ok=True)
    roidb, ann = make_micro_dataset(DATA_ROOT, n_images=6)
    os.environ["MICRO_DATA_ROOT"] = DATA_ROOT
    yield roidb, ann


def test_rpn_test_cli(micro_data):
    from rpn_test import rpn_test_net
    # random params -> recall is whatever it is, but the pipeline must run
    res = rpn_test_net("config/micro_test.py", max_images=4)
    assert isinstance(res, dict) and len(res) > 0
    for v in res.values():
        assert 0.0 <= v <= 1.0


def test_lr_sequential_and_advanced():
    from simpledet_tpu.core.schedule import (advanced, sequential,
                                             warmup_multifactor)
    base = warmup_multifactor(0.02, [10, 20], warmup_lr=0.005, warmup_iter=4)
    assert float(base(0)) == pytest.approx(0.005)
    assert float(base(4)) == pytest.approx(0.02)
    assert float(base(15)) == pytest.approx(0.002)
    assert float(base(25)) == pytest.approx(0.0002)

    seq = sequential([base, advanced(0.01, 100, "cosine")], [50])
    assert float(seq(49)) == pytest.approx(0.0002)
    assert float(seq(50)) == pytest.approx(0.01)


def test_fold_bn_stats():
    from utils.graph_optimize import fold_bn_stats
    rng = np.random.RandomState(0)
    g, b = rng.rand(8) + 0.5, rng.rand(8)
    m, v = rng.rand(8), rng.rand(8) + 0.5
    tree = {"stage1": {"bn1": {"gamma": g, "beta": b, "moving_mean": m,
                               "moving_var": v},
                       "conv1": {"kernel": np.ones((3, 3, 2, 8))}}}
    out = fold_bn_stats(tree, eps=1e-5)
    scale = g / np.sqrt(v + 1e-5)
    np.testing.assert_allclose(out["stage1"]["bn1"]["scale"], scale,
                               rtol=1e-6)
    np.testing.assert_allclose(out["stage1"]["bn1"]["bias"], b - m * scale,
                               rtol=1e-5)
    assert out["stage1"]["conv1"]["kernel"].shape == (3, 3, 2, 8)


def test_remat_train_step_matches(micro_data):
    """memonger (jax.checkpoint) must not change the math."""
    import jax
    import jax.numpy as jnp

    from simpledet_tpu.core.config import load_config
    from simpledet_tpu.core.optimizer import make_optimizer
    from simpledet_tpu.core.train import TrainState, make_train_step

    cfg = load_config("config/micro_test.py")
    out = cfg.get_config(is_train=True)
    model = out[6].train_symbol
    rng = np.random.RandomState(0)
    batch = {
        "data": jnp.asarray(rng.randn(1, 64, 96, 3), jnp.float32),
        "im_info": jnp.asarray([[64, 96, 1.0]], jnp.float32),
        "gt_bbox": jnp.asarray(
            np.concatenate([[[10, 10, 50, 40, 2]],
                            np.full((9, 5), -1)])[None], jnp.float32),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "sampling": jax.random.PRNGKey(1)},
        batch["data"], batch["im_info"], batch["gt_bbox"], mode="train")
    tx = make_optimizer(lambda s: 0.01, momentum=0.9, wd=1e-4)
    state = TrainState.create(apply_fn=model.apply,
                              params=variables["params"], tx=tx)

    step_plain = make_train_step(model, donate=False)
    step_remat = make_train_step(model, donate=False, remat=True)
    # memonger_until analog: recompute everything before stage3
    step_until = make_train_step(model, donate=False, remat="stage3")
    k = jax.random.PRNGKey(3)
    _, l1, _ = step_plain(state, batch, k)
    _, l2, _ = step_remat(state, batch, k)
    _, l3, _ = step_until(state, batch, k)
    for key in l1:
        np.testing.assert_allclose(float(l1[key]), float(l2[key]),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(float(l1[key]), float(l3[key]),
                                   rtol=1e-4, atol=1e-5)


def test_cosine_schedule_config(micro_data):
    """lr_mode='cosine' flows through the train CLI (AdvancedLRScheduler)."""
    import os as _os
    cfg_path = _os.path.join(DATA_ROOT, "micro_cos.py")
    with open("config/micro_test.py") as f:
        src = f.read()
    src = src.replace("class schedule:\n            begin_epoch = 0",
                      "class schedule:\n            lr_mode = \"cosine\"\n"
                      "            begin_epoch = 0")
    src = src.replace('name = "micro_test"', 'name = "micro_cos"')
    src = src.replace('prefix = "experiments/micro_test/checkpoint"',
                      'prefix = "experiments/micro_cos/checkpoint"')
    with open(cfg_path, "w") as f:
        f.write(src)
    import shutil as _sh
    _sh.rmtree("experiments/micro_cos", ignore_errors=True)
    from detection_train import train_net
    state = train_net(cfg_path, max_iter_override=2)
    import jax as _jax
    assert all(np.isfinite(np.asarray(x)).all()
               for x in _jax.tree.leaves(state.params))


def test_auto_resume(micro_data):
    """--resume picks up the latest epoch checkpoint without config edits."""
    import shutil as _sh
    cfg_path = os.path.join(DATA_ROOT, "micro_resume.py")
    with open("config/micro_test.py") as f:
        src = f.read()
    src = src.replace("end_epoch = 1", "end_epoch = 2")
    src = src.replace('name = "micro_test"', 'name = "micro_resume"')
    src = src.replace('prefix = "experiments/micro_test/checkpoint"',
                      'prefix = "experiments/micro_resume/checkpoint"')
    with open(cfg_path, "w") as f:
        f.write(src)
    _sh.rmtree("experiments/micro_resume", ignore_errors=True)
    from detection_train import train_net
    from simpledet_tpu.core.checkpoint import get_latest_ckpt_epoch
    # first run: stop after epoch 0's checkpoint (simulated crash at epoch 1)
    train_net(cfg_path, max_iter_override=1)
    before = get_latest_ckpt_epoch("experiments/micro_resume/checkpoint")
    assert before == 1  # wrote checkpoint-1 then "crashed"
    # resumed run starts at epoch `before`, trains it, writes checkpoint-2
    train_net(cfg_path, max_iter_override=1, auto_resume=True)
    after = get_latest_ckpt_epoch("experiments/micro_resume/checkpoint")
    assert after == 2


def test_tb_event_writer(tmp_path):
    """SummaryWriter emits a real TensorBoard event file (reference mxboard
    parity, reference doc/TENSORBOARD.md:10-28): verify the hand-rolled
    protobuf/TFRecord bytes load through the official tensorboard reader."""
    from simpledet_tpu.utils.logger import SummaryWriter

    logdir = str(tmp_path / "tb")
    w = SummaryWriter(logdir)
    w.add_scalar("train/rpn_cls_loss", 0.25, global_step=1)
    w.add_scalar("train/rpn_cls_loss", 0.125, global_step=2)
    w.add_scalar("lr", 0.02, global_step=2)
    w.close()

    files = [f for f in os.listdir(logdir) if "tfevents" in f]
    assert len(files) == 1

    pytest.importorskip("tensorboard")
    from tensorboard.backend.event_processing.event_accumulator import (
        EventAccumulator)
    acc = EventAccumulator(logdir)
    acc.Reload()
    tags = acc.Tags()["scalars"]
    assert set(tags) == {"train/rpn_cls_loss", "lr"}
    evs = acc.Scalars("train/rpn_cls_loss")
    assert [(e.step, e.value) for e in evs] == [(1, 0.25), (2, 0.125)]
    assert acc.Scalars("lr")[0].value == pytest.approx(0.02)
