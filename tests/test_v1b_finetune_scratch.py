"""resnet_v1b backbone group + finetune/scratch recipes: real train-step
coverage through the production CLI, promoting MODEL_ZOO.md's last two
"build-tested" rows to train-tested.

Reference capabilities: config/resnet_v1b/ (GluonCV v1b/v1d backbones:
stride on the 3x3 bottleneck conv, deep 3x3x3 stem, avg-pool shortcut),
config/finetune/ + doc/FINETUNE.md (start from a trained checkpoint,
freeze the backbone, reduced LR), config/scratch/ (no pretrain, SyncBN,
nothing frozen).
"""
import os
import shutil

import numpy as np
import pytest

import tests.conftest  # noqa: F401
import jax

pytestmark = pytest.mark.slow


def _micro_data():
    root = os.environ.get("MICRO_DATA_ROOT", "/tmp/simpledet_micro")
    if not os.path.isdir(root):
        from tests.fixtures import make_micro_dataset
        os.makedirs(root, exist_ok=True)
        make_micro_dataset(root, n_images=8)
        os.environ["MICRO_DATA_ROOT"] = root
    return root


def _flat(params):
    from flax.traverse_util import flatten_dict
    return {"/".join(map(str, k)): np.asarray(v)
            for k, v in flatten_dict(params).items()}


@pytest.mark.parametrize("variant", ["v1b", "v1d"])
def test_v1b_v1d_faster_train_step_cli(variant, monkeypatch):
    """The v1b/v1d backbones train through the real CLI with finite losses
    and the variant-specific stem actually in the graph."""
    _micro_data()
    monkeypatch.setenv("SIMPLEDET_MICRO_BACKBONE", variant)
    shutil.rmtree("experiments/micro_test", ignore_errors=True)
    from detection_train import train_net
    hist = []
    state = train_net("config/micro_test.py", max_iter_override=2,
                      loss_history=hist)
    assert hist and all(np.isfinite(h["total_loss"]) for h in hist)
    flat = _flat(state.params)
    if variant == "v1d":
        # deep stem: three 3x3 convs replace the single 7x7
        stems = [k for k in flat if "backbone/conv0_" in k]
        assert len(stems) == 3, sorted(k for k in flat if "conv0" in k)
        assert flat["backbone/conv0_0/kernel"].shape[:2] == (3, 3)
        assert not any(k.endswith("backbone/conv0/kernel") for k in flat)
    else:
        assert flat["backbone/conv0/kernel"].shape[:2] == (7, 7)
    leaves = [np.asarray(x) for x in jax.tree.leaves(state.params)]
    assert all(np.isfinite(l).all() for l in leaves)
    shutil.rmtree("experiments/micro_test", ignore_errors=True)


def test_finetune_recipe_micro(tmp_path):
    """Finetune recipe mechanics (reference doc/FINETUNE.md +
    config/finetune/faster_r50v1_fpn_finetune.py): pretrain checkpoint is
    loaded, the named subtree stays frozen at the loaded values, everything
    else keeps training at the reduced LR."""
    _micro_data()
    os.environ.pop("SIMPLEDET_MICRO_BACKBONE", None)
    from detection_train import train_net
    shutil.rmtree("experiments/micro_test", ignore_errors=True)
    base_state = train_net("config/micro_test.py", max_iter_override=2)
    base_flat = _flat(base_state.params)
    assert os.path.exists("experiments/micro_test/checkpoint-0001.params")

    cfg = tmp_path / "finetune_micro.py"
    cfg.write_text(
        "from simpledet_tpu.core.config import load_config\n"
        "_base = load_config('config/micro_test.py')\n\n\n"
        "def get_config(is_train):\n"
        "    cfg = list(_base.get_config(is_train))\n"
        "    General, ModelParam, OptimizeParam = cfg[0], cfg[6], cfg[7]\n"
        "    General.name = 'finetune_micro_test'\n"
        "    ModelParam.from_scratch = False\n"
        "    ModelParam.pretrain.prefix = "
        "'experiments/micro_test/checkpoint'\n"
        "    ModelParam.pretrain.epoch = 1\n"
        "    ModelParam.pretrain.fixed_param = ['backbone']\n"
        "    OptimizeParam.optimizer.lr = OptimizeParam.optimizer.lr / 10\n"
        "    return tuple(cfg)\n")
    shutil.rmtree("experiments/finetune_micro_test", ignore_errors=True)
    ft_state = train_net(str(cfg), max_iter_override=2)
    ft_flat = _flat(ft_state.params)

    frozen = [k for k in ft_flat if k.startswith("backbone/")]
    assert frozen
    for k in frozen:  # loaded from the checkpoint AND untouched by training
        np.testing.assert_array_equal(ft_flat[k], base_flat[k], err_msg=k)
    moved = [k for k in ft_flat if not k.startswith("backbone/")
             and ft_flat[k].shape == base_flat.get(k, np.zeros(0)).shape
             and np.abs(ft_flat[k] - base_flat[k]).max() > 0]
    assert moved, "no non-backbone param moved during finetune"
    shutil.rmtree("experiments/finetune_micro_test", ignore_errors=True)
    shutil.rmtree("experiments/micro_test", ignore_errors=True)


def test_scratch_recipe_micro(monkeypatch):
    """Scratch recipe mechanics (reference config/scratch/): SyncBN
    normalizer, no pretrain, and the stem params - frozen in the standard
    recipes - receive updates."""
    _micro_data()
    monkeypatch.setenv("SIMPLEDET_MICRO_NORM", "syncbn")
    from detection_train import train_net
    shutil.rmtree("experiments/micro_test", ignore_errors=True)
    hist = []
    state = train_net("config/micro_test.py", max_iter_override=2,
                      loss_history=hist)
    assert hist and all(np.isfinite(h["total_loss"]) for h in hist)
    # micro_test has fixed_param=[] like the scratch configs: assert the
    # stem conv actually trains (scratch configs unfreeze everything)
    assert state.batch_stats is not None  # SyncBN collected running stats
    means = [np.asarray(v) for k, v in _flat(state.batch_stats).items()
             if k.endswith("mean")]
    assert means and any(np.abs(m).max() > 0 for m in means)
    shutil.rmtree("experiments/micro_test", ignore_errors=True)


def test_scratch_and_v1b_full_configs_build():
    """The real (non-micro) scratch + finetune + v1b configs assemble with
    their distinctive knobs actually set."""
    from simpledet_tpu.core.config import load_config
    cfg = load_config(
        "config/scratch/faster_r50v1_fpn_syncbn_from_scratch_6x.py")
    out = cfg.get_config(is_train=True)
    ModelParam = out[6]
    assert ModelParam.from_scratch is True
    assert ModelParam.pretrain.fixed_param == []
    # the scratch recipe must really carry SyncBN (regression: the template
    # used to ignore norm_type)
    bb = out[6].train_symbol.backbone
    from simpledet_tpu.models.norm import SyncBN
    probe = bb.norm(name="probe")
    assert isinstance(probe, SyncBN), type(probe)

    ft = load_config("config/finetune/faster_r50v1_fpn_finetune.py")
    ModelParam = ft.get_config(is_train=True)[6]
    assert ModelParam.pretrain.fixed_param == ["backbone"]
