"""Test config: run everything on a virtual 8-device CPU mesh.

This is the TPU answer to "test multi-node without a cluster": XLA hosts N
virtual CPU devices so sharding/collective code paths execute for real.
Must run before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"

# The axon (remote TPU tunnel) PJRT plugin registered by sitecustomize routes
# compilation through a relay and slows CPU tests ~15x. Deregister it before
# any backend initializes; tests run purely on host CPU devices.
try:
    import jax
    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge as _xb
    _xb._backend_factories.pop("axon", None)
    _xb._backends.clear()
except Exception:
    pass
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")
