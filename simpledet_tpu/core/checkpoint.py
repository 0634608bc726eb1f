"""Checkpoint I/O — experiments/<name>/checkpoint-%04d layout.

Mirrors the reference format semantics (utils/load_model.py:18-39,
core/detection_module.py:185-205): per-epoch params (+ optimizer state)
written by process 0 only; pretrain bootstrapping with allow_missing keeps
fresh heads at their random init (detection_train.py:132-135).
Storage is flax msgpack (single file, no sharding needed at detection scale).
"""
import os
import pickle

import flax
import jax
import numpy as np


def _params_path(prefix, epoch):
    return f"{prefix}-{epoch:04d}.params"


def _states_path(prefix, epoch):
    return f"{prefix}-{epoch:04d}.states"


def _batch_stats_path(prefix, epoch):
    return f"{prefix}-{epoch:04d}.batch_stats"


def save_checkpoint(prefix, epoch, params, opt_state=None, step=None,
                    batch_stats=None):
    if jax.process_index() != 0:
        return
    # host_local: multi-process replicated arrays are not fully addressable
    # and np.asarray would raise; read the local replica instead
    from simpledet_tpu.parallel.mesh import host_local
    os.makedirs(os.path.dirname(prefix) or ".", exist_ok=True)
    params = host_local(params)
    with open(_params_path(prefix, epoch), "wb") as f:
        f.write(flax.serialization.to_bytes(params))
    if opt_state is not None:
        states = {"opt_state": host_local(opt_state),
                  "step": int(step) if step is not None else None}
        with open(_states_path(prefix, epoch), "wb") as f:
            pickle.dump(states, f)
    if batch_stats:
        # SyncBN running statistics (the reference's BN aux params,
        # utils/load_model.py:18-39 'aux:' entries)
        with open(_batch_stats_path(prefix, epoch), "wb") as f:
            f.write(flax.serialization.to_bytes(host_local(batch_stats)))


def load_batch_stats(prefix, epoch, template=None):
    """Running-stats collection saved next to the params, or None."""
    p = _batch_stats_path(prefix, epoch)
    if not os.path.exists(p):
        return None
    with open(p, "rb") as f:
        raw = f.read()
    if template is not None:
        return flax.serialization.from_bytes(template, raw)
    return flax.serialization.msgpack_restore(raw)


def load_checkpoint(prefix, epoch, params_template):
    """Returns (params, opt_state, step). opt_state/step are None when no
    .states file exists (e.g. params-only pretrain checkpoints); resuming
    then restarts the optimizer like the reference without -%04d.states
    (core/detection_module.py:813-842)."""
    with open(_params_path(prefix, epoch), "rb") as f:
        params = flax.serialization.from_bytes(params_template, f.read())
    opt_state, step = None, None
    sp = _states_path(prefix, epoch)
    if os.path.exists(sp):
        with open(sp, "rb") as f:
            states = pickle.load(f)
        if isinstance(states, dict) and "opt_state" in states:
            opt_state, step = states["opt_state"], states.get("step")
        else:  # legacy: raw opt_state tree
            opt_state = states
    return params, opt_state, step


def get_latest_ckpt_epoch(prefix):
    d = os.path.dirname(prefix) or "."
    base = os.path.basename(prefix)
    best = None
    if os.path.isdir(d):
        for fn in os.listdir(d):
            if fn.startswith(base + "-") and fn.endswith(".params"):
                try:
                    e = int(fn[len(base) + 1:-len(".params")])
                    best = e if best is None else max(best, e)
                except ValueError:
                    pass
    return best


def load_pretrain(params, prefix, epoch=0, allow_missing=True):
    """Merge a pretrain param tree into `params` by matching paths; missing
    entries keep their fresh init (allow_missing semantics). Accepts either
    our .params format or a flat npz of 'a/b/c' -> array."""
    flat = flax.traverse_util.flatten_dict(params)
    loaded = {}
    p_params = _params_path(prefix, epoch)
    if os.path.exists(p_params):
        with open(p_params, "rb") as f:
            raw = flax.serialization.msgpack_restore(f.read())
        loaded = flax.traverse_util.flatten_dict(raw)
    elif os.path.exists(prefix + ".npz"):
        npz = np.load(prefix + ".npz")
        loaded = {tuple(k.split("/")): npz[k] for k in npz.files}
    else:
        raise FileNotFoundError(f"no pretrain at {prefix}")

    n_hit = 0
    out = {}
    for path, val in flat.items():
        if path in loaded and loaded[path].shape == val.shape:
            out[path] = np.asarray(loaded[path], val.dtype)
            n_hit += 1
        else:
            if not allow_missing and path in loaded:
                raise ValueError(f"shape mismatch at {path}")
            out[path] = val
    return flax.traverse_util.unflatten_dict(out), n_hit
