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
    """Place a host batch dict on the mesh, sharded along the batch axis.

    Single-process: device_put the full batch. Multi-process (pod slice /
    the 2-process CPU test): each process holds only its LOCAL portion of
    the global batch (the loader rank-shards the roidb), so assemble a
    global array from per-process shards — the analog of the reference's
    per-worker kvstore batches (core/detection_input.py:790-810)."""
    sh = data_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree.map(
            lambda x: jax.make_array_from_process_local_data(
                sh, np.asarray(x)), batch)
    return jax.tree.map(lambda x: jax.device_put(x, sh), batch)


def host_local_array(x):
    """Fetch a (possibly multi-process global) array to host numpy.

    Fully-addressable arrays convert directly. For cross-process arrays:
    replicated values read from any local replica; batch-sharded values
    concatenate this process's shards in index order (each process sees
    its LOCAL rows — per-rank metrics, like the reference's per-worker
    Speedometer lines)."""
    if not isinstance(x, jax.Array) or x.is_fully_addressable:
        return np.asarray(x)
    shards = list(x.addressable_shards)
    first = shards[0].index
    if all(s.index == first for s in shards):     # replicated
        return np.asarray(shards[0].data)
    shards.sort(key=lambda s: (s.index[0].start or 0))
    return np.concatenate([np.asarray(s.data) for s in shards], axis=0)


def host_local(tree):
    return jax.tree.map(host_local_array, tree)
