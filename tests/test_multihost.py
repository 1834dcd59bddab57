"""Multi-host (pod) data-parallel scaffolding tests.

True multi-process execution needs a coordinator + N processes; here the
contracts are verified in-process (the driver's dryrun covers the mesh
execution): row sharding is a disjoint cover, the single-process
`make_array_from_process_local_data` path bit-matches the plain
device_put sharding path, and the host-sharded batcher's concatenation
contract composes a valid global batch.
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from pivp_tpu.data import synthetic
from pivp_tpu.parallel import mesh as mesh_lib
from pivp_tpu.parallel import multihost


def test_initialize_noop_without_cluster():
    assert multihost.initialize() is False
    pi, pc = multihost.process_info()
    assert (pi, pc) == (0, 1)


def test_shard_rows_disjoint_cover():
    for n, pc in [(10, 3), (8, 8), (7, 2), (264, 16), (5, 7)]:
        seen = []
        for pi in range(pc):
            r = multihost.shard_rows(n, pi, pc)
            seen.extend(r)
            # Contiguity + leading-host remainder policy.
            assert len(r) in (n // pc, n // pc + 1)
        assert seen == list(range(n))


def test_local_batch_size():
    assert multihost.local_batch_size(32, 4) == 8
    try:
        multihost.local_batch_size(30, 4)
        assert False, "expected ValueError"
    except ValueError:
        pass


def test_make_global_batch_bitmatches_device_put():
    mesh = mesh_lib.make_mesh(8)
    rng = np.random.RandomState(0)
    imgs = rng.rand(4, 8, 6, 6, 3).astype(np.float32)
    acts = rng.rand(4, 8, 5).astype(np.float32)
    stas = rng.rand(4, 8, 5).astype(np.float32)
    g = multihost.make_global_batch(mesh, (imgs, acts, stas), 8)
    for arr, host in zip(g, (imgs, acts, stas)):
        ref = jax.device_put(jnp.asarray(host),
                             NamedSharding(mesh, P(None, "data")))
        assert arr.sharding.is_equivalent_to(ref.sharding, arr.ndim)
        np.testing.assert_array_equal(np.asarray(arr), np.asarray(host))


def test_host_sharded_batcher_contract():
    """Simulated 2-host composition: each host's batcher draws only from
    its own row shard, local batches are B/2, and the (host0, host1)
    concatenation forms a global batch whose rows all come from the
    right shards."""
    arrays = synthetic.generate_sequences(12, 4, 8, 8)
    # Tag each sequence's first pixel with its row index for tracking.
    imgs = arrays[0].copy()
    imgs[:, :, 0, 0, 0] = np.arange(12)[:, None]
    arrays = (imgs, arrays[1], arrays[2])

    batchers = [
        multihost.HostShardedBatcher(arrays, global_batch=4, seed=3,
                                     process_index=pi, process_count=2)
        for pi in range(2)]
    shards = [multihost.shard_rows(12, pi, 2) for pi in range(2)]
    for _ in range(9):   # crosses epoch boundaries (6 rows, B_local 2)
        locals_ = [b.next() for b in batchers]
        for (ims, acts, stas), shard in zip(locals_, shards):
            assert ims.shape[1] == 2  # B_local = 4 / 2
            rows = ims[0, :, 0, 0, 0].astype(int)
            assert all(r in shard for r in rows)
        # Global assembly contract: concat over hosts on the batch axis.
        glob = np.concatenate([l[0] for l in locals_], axis=1)
        assert glob.shape[1] == 4


def test_host_sharded_batcher_epoch_sync():
    arrays = synthetic.generate_sequences(8, 4, 8, 8)
    batchers = [
        multihost.HostShardedBatcher(arrays, global_batch=4, seed=0,
                                     process_index=pi, process_count=2)
        for pi in range(2)]
    for step in range(6):
        for b in batchers:
            b.next()
        assert batchers[0].epoch == batchers[1].epoch
        assert batchers[0].is_new_epoch == batchers[1].is_new_epoch


def test_make_global_batch_spatial_bitmatches_device_put():
    """spatial=True: images get H over the model axis (vectors stay
    data-only), values and placement identical to a plain device_put
    with the same shardings."""
    mesh = mesh_lib.make_mesh(8, model_parallel=2)   # 4 dp x 2 sp
    assert mesh_lib.model_axis_process_local(mesh)
    rng = np.random.RandomState(0)
    imgs = rng.rand(4, 8, 6, 6, 3).astype(np.float32)
    acts = rng.rand(4, 8, 5).astype(np.float32)
    stas = rng.rand(4, 8, 5).astype(np.float32)
    g = multihost.make_global_batch(mesh, (imgs, acts, stas), 8,
                                    spatial=True)
    specs = (P(None, "data", "model"), P(None, "data"), P(None, "data"))
    for arr, host, spec in zip(g, (imgs, acts, stas), specs):
        ref = jax.device_put(jnp.asarray(host), NamedSharding(mesh, spec))
        assert arr.sharding.is_equivalent_to(ref.sharding, arr.ndim)
        np.testing.assert_array_equal(np.asarray(arr), np.asarray(host))


def test_make_global_batch_spatial_k_stacked():
    """batch_axis=2 (K-dispatch payload) with spatial height sharding."""
    mesh = mesh_lib.make_mesh(8, model_parallel=2)
    rng = np.random.RandomState(1)
    imgs = rng.rand(2, 4, 8, 6, 6, 3).astype(np.float32)
    acts = rng.rand(2, 4, 8, 5).astype(np.float32)
    stas = rng.rand(2, 4, 8, 5).astype(np.float32)
    g = multihost.make_global_batch(mesh, (imgs, acts, stas), 8,
                                    batch_axis=2, spatial=True)
    ref = jax.device_put(jnp.asarray(imgs), NamedSharding(
        mesh, P(None, None, "data", "model")))
    assert g[0].sharding.is_equivalent_to(ref.sharding, g[0].ndim)
    for arr, host in zip(g, (imgs, acts, stas)):
        np.testing.assert_array_equal(np.asarray(arr), np.asarray(host))


def test_hostsharded_batcher_rejects_unequal_shards():
    """Unequal host shards would desynchronize epoch boundaries across
    hosts (collective validation/checkpoint schedules diverge) — the
    constructor rejects them; callers trim first (the training loop
    does)."""
    import pytest

    from pivp_tpu.parallel import multihost

    arrays = synthetic.generate_sequences(7, 4, 8, 8)
    with pytest.raises(ValueError, match="equal shards"):
        multihost.HostShardedBatcher(arrays, global_batch=4, seed=0,
                                     process_index=0, process_count=2)
