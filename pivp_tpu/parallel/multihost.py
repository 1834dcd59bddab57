"""Multi-host (pod) data-parallel scaffolding.

A TPU pod is driven by one process per host, each seeing only its local
chips; arrays spanning the pod are assembled from per-process shards.
This module provides the pod story for the training pipeline
(SURVEY.md §5 "host-local data loading feeding per-device shards"):

  * `initialize()` — `jax.distributed.initialize` wrapper (no-op for the
    single-process case, so every entry point can call it
    unconditionally);
  * `shard_rows()` — contiguous per-host split of the map.csv sequence
    list, so each host READS only its own slice of the dataset (the
    reference loads everything everywhere, train_model.py:813-834 —
    single-device, so it never had this problem);
  * `HostShardedBatcher` — per-host epoch batcher producing the local
    rows of a global batch, epoch-synchronized across hosts by
    construction (same seed schedule, host-disjoint data);
  * `make_global_batch()` — `jax.make_array_from_process_local_data`
    over the mesh's data axis: each process contributes its local batch
    rows and the result is one global jit-ready array.

Composition contract: the global batch of size B is the concatenation of
per-host batches of size B/process_count; each host shuffles its OWN
row shard (standard host-local loading — global batches mix rows only
across epochs, not within a step). Metrics aggregated from per-step
losses are means over the global batch because every host computes the
same jitted program over the same global arrays.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pivp_tpu.data import dataset as dataset_lib
from pivp_tpu.parallel import mesh as mesh_lib


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize the JAX distributed runtime when running multi-process.

    Returns True if distributed mode was initialized. With no arguments
    and no cluster environment (TPU pod metadata, SLURM, ...), this is a
    no-op returning False — safe to call unconditionally from CLIs.
    """
    if coordinator_address is None and num_processes is None:
        # Auto-detection path: only initialize when a cluster environment
        # is present; plain single-host runs stay uninitialized.
        try:
            import jax._src.clusters as clusters
            detected = any(
                env.is_env_present()
                for env in clusters.ClusterEnv.__subclasses__())
        except Exception:
            detected = False
        if not detected:
            return False
        jax.distributed.initialize()
        return True
    jax.distributed.initialize(coordinator_address=coordinator_address,
                               num_processes=num_processes,
                               process_id=process_id)
    return True


def process_info() -> Tuple[int, int]:
    """(process_index, process_count) of this host."""
    return jax.process_index(), jax.process_count()


def agree_string(s: str, max_len: int = 128) -> str:
    """All processes adopt process 0's value of a short string.

    Used for the timestamped run name: hosts can cross a second boundary
    during startup and disagree on `time.strftime`, but collective
    checkpointing (orbax) requires every process to address the SAME
    run directory. No-op (returns `s`) in single-process runs.
    """
    if jax.process_count() == 1:
        return s
    from jax.experimental import multihost_utils

    raw = s.encode()
    if len(raw) > max_len:
        raise ValueError(f"string longer than {max_len} bytes: {s!r}")
    buf = np.zeros(max_len, np.uint8)
    buf[:len(raw)] = np.frombuffer(raw, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return bytes(out).rstrip(b"\x00").decode()


def agree_flag(flag: bool) -> bool:
    """Collective OR of a per-process boolean.

    Used at dispatch boundaries so a preemption signal (SIGTERM) that
    reached only SOME hosts still stops EVERY host at the same step —
    all processes then reach the collective orbax checkpoint barrier
    together instead of the signaled host blocking at it alone. Cheap:
    one tiny allgather per dispatch (~K optimizer steps). No-op in
    single-process runs.
    """
    if jax.process_count() == 1:
        return flag
    from jax.experimental import multihost_utils

    out = multihost_utils.process_allgather(
        np.asarray([flag], dtype=np.uint8))
    return bool(np.asarray(out).any())


def shard_rows(n_rows: int, process_index: int,
               process_count: int) -> range:
    """Contiguous per-host row assignment covering [0, n_rows) exactly
    once across hosts; remainders go to the leading hosts."""
    if not 0 <= process_index < process_count:
        raise ValueError(f"process_index {process_index} not in "
                         f"[0, {process_count})")
    base, rem = divmod(n_rows, process_count)
    start = process_index * base + min(process_index, rem)
    count = base + (1 if process_index < rem else 0)
    return range(start, start + count)


def local_batch_size(global_batch: int, process_count: int) -> int:
    if global_batch % process_count:
        raise ValueError(f"global batch {global_batch} not divisible by "
                         f"{process_count} processes")
    return global_batch // process_count


class HostShardedBatcher:
    """Per-host view of a globally batch_size-B stream.

    Each host owns `shard_rows(n, pi, pc)` of the dataset and draws
    epoch-shuffled local batches of B/pc rows; the concatenation over
    hosts (in process order) is the global batch `make_global_batch`
    assembles. Requires EQUAL host shards (n_rows % pc == 0, enforced) —
    epoch boundaries are then synchronized across hosts by construction,
    which the loop's collective validation sweeps and checkpoint epochs
    depend on. Callers with a ragged row count trim it first (the
    training loop does; loop.py)."""

    def __init__(self, arrays, global_batch: int, seed: int,
                 process_index: Optional[int] = None,
                 process_count: Optional[int] = None):
        if process_index is None or process_count is None:
            process_index, process_count = process_info()
        self.process_index = process_index
        self.process_count = process_count
        n = arrays[0].shape[0]
        if n % process_count:
            raise ValueError(
                f"{n} rows do not split into equal shards over "
                f"{process_count} processes; trim to a multiple first "
                f"(unequal shards would desynchronize epoch boundaries "
                f"across hosts)")
        rows = shard_rows(n, process_index, process_count)
        local = tuple(a[rows.start:rows.stop] for a in arrays)
        # Distinct seed per host: hosts hold disjoint data, so identical
        # permutations would be fine too, but decorrelating them makes
        # the global batch composition independent of host count changes
        # within a shard.
        self.local = dataset_lib.EpochBatcher(
            local, local_batch_size(global_batch, process_count),
            seed=seed + process_index)

    def next(self):
        return self.local.next()

    def next_indices(self) -> np.ndarray:
        """Local-shard sequence indices for one batch — the fused
        K-dispatch assembler (data/assembler.py) gathers them from
        `self.arrays`, yielding exactly the (K, T, B_local, ...) rows
        `make_global_batch` expects from this host."""
        return self.local.next_indices()

    def seek(self, num_batches: int) -> None:
        """Fast-forward this host's shard stream by `num_batches` global
        batches (deterministic resume; see EpochBatcher.seek). Every
        host seeks the same count, so epoch schedules stay in lockstep."""
        self.local.seek(num_batches)

    @property
    def arrays(self):
        """This host's local (images, actions, states) row shard."""
        return self.local.arrays

    @property
    def epoch(self) -> int:
        return self.local.epoch

    @property
    def is_new_epoch(self) -> bool:
        return self.local.is_new_epoch


def make_global_batch(mesh: Mesh, host_batch, global_batch: int,
                      batch_axis: int = 1, spatial: bool = False):
    """Assemble one global time-major batch from this process's local
    rows via `jax.make_array_from_process_local_data`.

    host_batch: (images (T, B_local, H, W, C), actions (T, B_local, A),
    states (T, B_local, S)) numpy arrays. Returns the same tuple as
    global jax.Arrays sharded P(None, 'data', ...) over `mesh` (which
    may span processes). `batch_axis=2` handles K-stacked payloads
    (K, T, B_local, ...) from the K-steps-per-dispatch path.

    `spatial=True` additionally shards the image HEIGHT (the axis after
    batch, images only) over the mesh's `model` axis. Each host holds
    full-height rows, so every height shard of its batch columns must be
    addressable locally — the caller guards with
    `mesh_lib.model_axis_process_local(mesh)`.
    """
    out = []
    for i, arr in enumerate(host_batch):
        axes = [None] * batch_axis + [mesh_lib.DATA_AXIS]
        if spatial and i == 0:              # images: H over `model`
            axes.append(mesh_lib.MODEL_AXIS)
        sharding = NamedSharding(mesh, P(*axes))
        global_shape = (arr.shape[:batch_axis] + (global_batch,)
                        + arr.shape[batch_axis + 1:])
        out.append(jax.make_array_from_process_local_data(
            sharding, np.ascontiguousarray(arr), global_shape))
    return tuple(out)
