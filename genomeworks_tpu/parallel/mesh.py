"""Device-mesh helpers for data-parallel batch execution.

The reference scales across GPUs by spawning one CPU worker thread per
device pulling from a shared queue (cudamapper/src/main.cu:453-594). The
TPU-native equivalent is SPMD: one program, batches sharded over a mesh
axis, XLA inserting ICI collectives where needed.
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: int | None = None, axis_name: str = DATA_AXIS) -> Mesh:
    """A 1-D data-parallel mesh over the first n devices."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis_name,))


def batch_sharding(mesh: Mesh, ndim: int, axis_name: str = DATA_AXIS) -> NamedSharding:
    """Sharding that splits the leading (batch) dim, replicates the rest."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def pad_batch_to_multiple(arrays: list[np.ndarray], multiple: int) -> list[np.ndarray]:
    """Pad the leading dim of each array to a multiple (so it shards evenly).
    Padding rows are zeros; callers mask by length vectors as usual."""
    out = []
    for a in arrays:
        b = a.shape[0]
        pad = (-b) % multiple
        if pad:
            a = np.concatenate([a, np.zeros((pad,) + a.shape[1:], dtype=a.dtype)], axis=0)
        out.append(a)
    return out


def shard_batch(mesh: Mesh, *arrays, axis_name: str = DATA_AXIS):
    """Device-put arrays with their leading dim sharded over the mesh."""
    return tuple(
        jax.device_put(a, batch_sharding(mesh, np.ndim(a), axis_name)) for a in arrays
    )
