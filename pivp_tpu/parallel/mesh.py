"""Device mesh + sharding layout.

The reference is single-process / single-device (`--gpu` picks one cupy
device; /root/reference/src/models/train_model.py:888-894 — no NCCL/MPI
anywhere). Scale-out is therefore a new, TPU-native capability: a
`jax.sharding.Mesh` with a `data` axis for batch parallelism (gradient
psum rides ICI, inserted by XLA from the sharding annotations) and an
optional `model` axis reserved for spatially-sharded variants.

Everything here is GSPMD: annotate in/out shardings on one jitted train
step; XLA partitions the program and places the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(num_devices: int = 0, model_parallel: int = 1,
              devices: Optional[Sequence[jax.Device]] = None) -> Mesh:
    """Build a (data, model) mesh. `num_devices=0` uses every visible
    device. data-major ordering keeps gradient reductions on neighboring
    ICI links."""
    if devices is None:
        devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    n = len(devices)
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel="
                         f"{model_parallel}")
    grid = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def model_axis_process_local(mesh: Mesh) -> bool:
    """True when every data-row of the mesh grid (all model-axis shards
    of one data shard) lives on ONE process. Required for multi-host
    spatial parallelism: `make_array_from_process_local_data` can only
    fill a process's addressable shards from that process's host batch,
    so the height shards of a host's batch rows must be local to it."""
    grid = mesh.devices.reshape(-1, mesh.shape[MODEL_AXIS])
    return all(len({d.process_index for d in row}) == 1 for row in grid)


def auto_num_devices(batch_size: int, num_devices: int = 0) -> int:
    """Largest device count <= the visible (or requested) devices that
    evenly divides the batch, so GSPMD batch sharding is always valid."""
    available = num_devices or len(jax.devices())
    n = min(available, batch_size)
    while n > 1 and batch_size % n:
        n -= 1
    return max(n, 1)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, time_major: bool = True) -> NamedSharding:
    """Shard the batch axis over `data`. Batches are time-major
    (T, B, ...), so the sharded axis is axis 1."""
    if time_major:
        return NamedSharding(mesh, P(None, DATA_AXIS))
    return NamedSharding(mesh, P(DATA_AXIS))


def batch_shardings(mesh: Mesh, spatial: bool = False):
    """(images, actions, states) shardings for a time-major batch tuple.
    With `spatial`, images (T, B, H, W, C) additionally shard H over the
    `model` axis (vectors have no spatial axis)."""
    if spatial:
        img = NamedSharding(mesh, P(None, DATA_AXIS, MODEL_AXIS))
        vec = NamedSharding(mesh, P(None, DATA_AXIS))
        return (img, vec, vec)
    s = batch_sharding(mesh)
    return (s, s, s)


def call_shardings(mesh: Mesh, spatial: bool = False):
    """(images, actions, states) shardings for a K-dispatch payload
    (K, T, B, ...): batch over `data`, and with `spatial` the image
    height over `model`."""
    if spatial:
        img = NamedSharding(mesh, P(None, None, DATA_AXIS, MODEL_AXIS))
    else:
        img = NamedSharding(mesh, P(None, None, DATA_AXIS))
    vec = NamedSharding(mesh, P(None, None, DATA_AXIS))
    return (img, vec, vec)


def shard_batch(mesh: Mesh, batch, spatial: bool = False):
    """Device_put a host batch with the batch axis sharded over `data`
    (and, with `spatial`, image height over `model`). On a single-device
    mesh, plain device_put (the GSPMD layout path is pure overhead
    there)."""
    if mesh.size <= 1:
        return jax.device_put(batch)
    return jax.device_put(batch, batch_shardings(mesh, spatial=spatial))
