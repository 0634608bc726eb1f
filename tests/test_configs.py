"""Every shipped config must build its 13-tuple in both modes (the analog
of the reference's config-as-code contract, doc/fully_annotated_config.py)."""
import glob
import os

import pytest

import tests.conftest  # noqa: F401

CONFIGS = sorted(
    p for p in glob.glob("config/**/*.py", recursive=True)
    if not p.endswith("__init__.py")
    and "micro" not in p          # exercised by the e2e tests
    and not p.endswith("converge_common.py")  # shared scaffolding helper,
                                              # no get_config of its own
)


@pytest.mark.parametrize("path", CONFIGS)
def test_config_builds(path):
    from simpledet_tpu.core.config import load_config
    cfg = load_config(path)
    for is_train in (True, False):
        out = cfg.get_config(is_train)
        assert len(out) == 13, path
        ModelParam = out[6]
        if is_train:
            assert ModelParam.train_symbol is not None, path
        else:
            assert ModelParam.test_symbol is not None, path
        assert out[9], f"{path}: empty transform list"
        assert isinstance(out[10], list) and isinstance(out[11], list)
