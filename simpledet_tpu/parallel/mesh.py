"""Device mesh + sharding helpers.

One mechanism replaces all three reference communication paths (NCCL kvstore,
DMLC parameter server, SyncBN pthread barrier — SURVEY.md §2.8): a
jax.sharding.Mesh with a 'data' axis. The train step is jit-compiled with the
batch sharded over 'data' and params replicated; XLA inserts gradient
all-reduces over ICI/DCN automatically. Host-side data sharding uses
jax.process_index() (the analog of kvstore rank splitting,
core/detection_input.py:790-810).
"""
import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices=None):
    devices = devices if devices is not None else jax.devices()
    return Mesh(np.asarray(devices), ("data",))


def data_sharding(mesh):
    return NamedSharding(mesh, P("data"))


def replicated(mesh):
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh):
    """Place a host batch dict on the mesh, sharded along the batch axis."""
    sh = data_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)
