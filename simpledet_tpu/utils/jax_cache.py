"""Persistent XLA compilation cache setup.

The full flagship train step cold-compiles in ~9 minutes over the remote TPU
tunnel (measured tools/perf_bf16.py); the persistent cache makes every
subsequent process start in seconds. The reference had no analog — MXNet
graphs bind per-process — this is the TPU-native replacement for its
"bind once, reuse executors" model across process restarts.
"""
import os


def enable_compilation_cache(default_dir=None):
    import jax

    cache_dir = os.environ.get("JAX_COMPILATION_CACHE_DIR",
                               default_dir or "/tmp/simpledet_jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        if os.environ.get("SIMPLEDET_CACHE_DEBUG"):
            # log WHY a lookup missed (writes to warnings); invaluable over
            # the TPU tunnel where each miss costs minutes of recompile
            jax.config.update("jax_explain_cache_misses", True)
    except Exception:  # best effort — cache is an optimization only
        pass
    return cache_dir
