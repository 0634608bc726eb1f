"""Config-as-code support: nothrow attribute patching + config loading.

Mirrors utils/patch_config.py:15 patch_config_as_nothrow in the reference:
any missing attribute on a (possibly nested) config class reads as None, so
experiment configs stay minimal. Configs are python modules exporting
get_config(is_train) (reference config/faster_r50v1_fpn_1x.py:11,297-299).
"""
import importlib.util
import sys


class _NothrowMeta(type):
    def __getattr__(cls, name):
        if name.startswith("__"):
            raise AttributeError(name)
        return None


def patch_config_as_nothrow(cfg):
    """Recursively rebind a config class (and nested classes) so missing
    attributes read as None instead of raising."""
    if cfg is None:
        return None
    if isinstance(cfg, type):
        if "Nothrow" in cfg.__name__ or isinstance(cfg, _NothrowMeta):
            return cfg
        patched = _NothrowMeta(cfg.__name__ + "Nothrow", (cfg,), {})
        for name in dir(cfg):
            if name.startswith("__"):
                continue
            val = getattr(cfg, name)
            if isinstance(val, type):
                setattr(patched, name, patch_config_as_nothrow(val))
        return patched
    # instance: patch its class and nested class-valued attributes
    cls = cfg.__class__
    if not isinstance(cls, _NothrowMeta) and "Nothrow" not in cls.__name__:
        cfg.__class__ = _NothrowMeta(cls.__name__ + "Nothrow", (cls,), {})
    for name in dir(cfg):
        if name.startswith("__"):
            continue
        try:
            val = getattr(cfg, name)
        except AttributeError:
            continue
        if isinstance(val, type) and not isinstance(val, _NothrowMeta):
            setattr(cfg, name, patch_config_as_nothrow(val))
        elif (not isinstance(val, type) and hasattr(val, "__dict__")
              and val.__class__.__module__ not in ("builtins",)
              and not callable(val)):
            patch_config_as_nothrow(val)
    return cfg


def patch_all(*cfgs):
    """Nothrow-patch every config class (entry points call this on the
    get_config tuple, like the reference's per-class patching)."""
    return tuple(patch_config_as_nothrow(c) if isinstance(c, type) else c
                 for c in cfgs)


def load_config(path):
    """Import a config file by path (reference detection_train.py:301-307
    style: `--config config/foo.py`). Returns the module."""
    name = path.removesuffix(".py").replace("/", "_").replace(".", "_")
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    spec.loader.exec_module(mod)
    return mod
