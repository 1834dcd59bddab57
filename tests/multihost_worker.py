"""Worker process for the REAL multi-process multi-host test.

Launched N times by tests/test_multihost_procs.py, each instance with its
own process_id. Every process sees only its 2 local virtual CPU devices
(`xla_force_host_platform_device_count=2`); `jax.distributed.initialize`
joins them into one 2x2=4-device cluster, and the worker then runs the
framework's actual pod story end to end:

  host-local rows (multihost.shard_rows) -> HostShardedBatcher ->
  make_global_batch (jax.make_array_from_process_local_data) ->
  GSPMD train_step over the global (data=4) mesh.

It prints per-step losses and a final parameter checksum as one JSON
line to `outfile` so the parent can assert (a) both processes computed
identical replicated results and (b) the distributed run matches a
single-process run over the same composed global batches.

The reference has no multi-process anything (single device,
/root/reference/src/models/train_model.py:888-894); this is the
TPU-native pod-scale data path of SURVEY.md §5.
"""

import json
import os
import sys


def main() -> None:
    mode, coord, pc, pi, outfile = (sys.argv[1], sys.argv[2],
                                    int(sys.argv[3]), int(sys.argv[4]),
                                    sys.argv[5])
    n_local = int(sys.argv[6]) if len(sys.argv) > 6 else 2
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_local}").strip()

    import jax
    jax.config.update("jax_default_matmul_precision", "highest")
    # The env var alone is not enough when a TPU plugin (axon) is
    # importable — force the CPU backend before distributed init.
    jax.config.update("jax_platforms", "cpu")

    from pivp_tpu.parallel import multihost

    assert multihost.initialize(coord, pc, pi) is True
    assert multihost.process_info() == (pi, pc)
    assert len(jax.local_devices()) == n_local
    assert len(jax.devices()) == n_local * pc

    try:
        if mode == "driver":
            run_driver(pi, pc, outfile)
            return
        if mode == "driver_orbax":
            run_driver_orbax(pi, pc, outfile)
            return
        if mode == "driver_preempt":
            run_driver_preempt(pi, pc, outfile)
            return
        if mode == "driver_spatial":
            run_driver_spatial(pi, pc, outfile)
            return
        if mode == "step_spatial":
            run_step_spatial(pi, pc, outfile)
            return
        assert mode == "step", mode
        run_step(pi, pc, outfile)
    finally:
        # Orderly teardown so no process races the coordinator away.
        try:
            jax.distributed.shutdown()
        except Exception:
            pass


def run_step(pi: int, pc: int, outfile: str) -> None:
    import jax
    import jax.numpy as jnp

    from pivp_tpu.config import ModelConfig
    from pivp_tpu.data import synthetic
    from pivp_tpu.parallel import mesh as mesh_lib
    from pivp_tpu.parallel import multihost
    from pivp_tpu.parallel import train_step as ts_lib

    cfg = ModelConfig(image_height=16, image_width=16, sequence_length=4,
                      context_frames=2, num_masks=3,
                      scheduled_sampling_k=-1.0)
    mesh = mesh_lib.make_mesh()          # every global device, dp
    assert mesh.size == len(jax.devices())

    # Every process generates the identical full dataset (seed-fixed) and
    # then reads ONLY its own row shard through HostShardedBatcher — in a
    # real pod each host would load its shard_rows() slice of map.csv.
    arrays = synthetic.generate_sequences(12, 4, 16, 16, seed=0)
    batcher = multihost.HostShardedBatcher(arrays, global_batch=4, seed=7)

    opt = ts_lib.make_optimizer(1e-3)
    state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = ts_lib.make_train_step(cfg, opt, mesh)
    rng = jax.random.PRNGKey(1)

    losses = []
    for i in range(4):
        local = batcher.next()           # time-major (T, B_local, ...)
        batch = multihost.make_global_batch(mesh, local, 4)
        state, m = step(state, batch, jnp.float32(i),
                        jax.random.fold_in(rng, i))
        losses.append(float(jax.device_get(m["loss"])))

    checksum = float(jax.device_get(jax.jit(
        lambda p: jax.tree_util.tree_reduce(
            jnp.add, jax.tree_util.tree_map(
                lambda x: jnp.sum(jnp.abs(x)), p)))(state.params)))

    with open(outfile, "w") as f:
        json.dump({"process": pi, "losses": losses,
                   "checksum": checksum,
                   "epoch": batcher.epoch}, f)


def run_step_spatial(pi: int, pc: int, outfile: str) -> None:
    """Multi-host data parallelism COMPOSED with spatial (height)
    parallelism: a (data=2, model=2) mesh over 2 processes x 2 local
    devices — each host contributes full-height local batch rows, and
    GSPMD splits the height over that host's own two devices (halo
    exchanges stay host-local by construction)."""
    import jax
    import jax.numpy as jnp

    from pivp_tpu.config import ModelConfig
    from pivp_tpu.data import synthetic
    from pivp_tpu.parallel import mesh as mesh_lib
    from pivp_tpu.parallel import multihost
    from pivp_tpu.parallel import train_step as ts_lib

    # 64x64: the spatial guard needs (H//8)/2 >= 4 rows per shard.
    cfg = ModelConfig(sequence_length=3, context_frames=1, num_masks=3,
                      scheduled_sampling_k=-1.0)
    mesh = mesh_lib.make_mesh(model_parallel=2)
    assert mesh.shape == {"data": pc, "model": 2}
    assert mesh_lib.model_axis_process_local(mesh)

    arrays = synthetic.generate_sequences(12, 3, 64, 64, seed=0)
    batcher = multihost.HostShardedBatcher(arrays, global_batch=4, seed=7)

    opt = ts_lib.make_optimizer(1e-3)
    state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = ts_lib.make_train_step(cfg, opt, mesh, spatial_parallel=True)
    rng = jax.random.PRNGKey(1)

    losses = []
    for i in range(3):
        local = batcher.next()
        batch = multihost.make_global_batch(mesh, local, 4, spatial=True)
        state, m = step(state, batch, jnp.float32(i),
                        jax.random.fold_in(rng, i))
        losses.append(float(jax.device_get(m["loss"])))

    checksum = float(jax.device_get(jax.jit(
        lambda p: jax.tree_util.tree_reduce(
            jnp.add, jax.tree_util.tree_map(
                lambda x: jnp.sum(jnp.abs(x)), p)))(state.params)))

    with open(outfile, "w") as f:
        json.dump({"process": pi, "losses": losses,
                   "checksum": checksum}, f)


def run_driver_spatial(pi: int, pc: int, outfile: str) -> None:
    """The ACTUAL training driver in multi-host mode with
    --spatial_parallel 2: (data, model) mesh spanning processes,
    K-dispatch global-batch assembly with height sharding on the
    prefetch thread."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pivp_tpu.config import TrainConfig
    from pivp_tpu.data import synthetic
    from pivp_tpu.training import loop

    out_dir = os.path.join(os.path.dirname(outfile), f"sprun-p{pi}")
    cfg = TrainConfig(
        output_dir=out_dir, event_log_dir=out_dir,
        num_iterations=4, sequence_length=3, context_frames=1,
        num_masks=3, schedsamp_k=-1.0, batch_size=4,
        train_val_split=1.0,           # no val sweep: one compile only
        validation_interval=100, save_interval=100, seed=0,
        steps_per_call=2, spatial_parallel=2)
    arrays = synthetic.generate_sequences(12, 3, 64, 64, seed=0)
    result = loop.run_training(cfg, arrays=arrays, run_name="podspatial")

    checksum = float(jax.device_get(jax.jit(
        lambda p: jax.tree_util.tree_reduce(
            jnp.add, jax.tree_util.tree_map(
                lambda x: jnp.sum(jnp.abs(x)), p)))(
                    result["state"].params)))
    losses = np.asarray(result["global_losses"])[:, 0].tolist()
    with open(outfile, "w") as f:
        json.dump({"process": pi, "losses": losses,
                   "checksum": checksum}, f)


def run_driver(pi: int, pc: int, outfile: str) -> None:
    """Run the ACTUAL training driver (training/loop.run_training) in
    multi-host mode: host-sharded batcher + make_global_batch on the
    prefetch thread, collective validation sweep, primary-only
    checkpoints/events — the code path `train_cli --coordinator_address`
    takes on a pod."""
    import glob

    import jax
    import jax.numpy as jnp
    import numpy as np

    from pivp_tpu.config import TrainConfig
    from pivp_tpu.data import synthetic
    from pivp_tpu.training import loop

    out_dir = os.path.join(os.path.dirname(outfile), f"run-p{pi}")
    cfg = TrainConfig(
        output_dir=out_dir, event_log_dir=out_dir,
        num_iterations=6, sequence_length=4, context_frames=2,
        image_height=16, image_width=16, num_masks=3,
        schedsamp_k=-1.0, batch_size=4, train_val_split=0.95,
        validation_interval=1, save_interval=1, seed=0)
    # 12 sequences -> 11 train / 1 val; the driver trims to 10 for two
    # equal 5-row host shards. Every process generates the identical
    # dataset (fixed seed) and reads only its own shard.
    arrays = synthetic.generate_sequences(12, 4, 16, 16, seed=0)
    result = loop.run_training(cfg, arrays=arrays, run_name="podtest")

    checksum = float(jax.device_get(jax.jit(
        lambda p: jax.tree_util.tree_reduce(
            jnp.add, jax.tree_util.tree_map(
                lambda x: jnp.sum(jnp.abs(x)), p)))(
                    result["state"].params)))
    losses = np.asarray(result["global_losses"])[:, 0].tolist()  # means
    wrote = sorted(os.path.basename(p)
                   for p in glob.glob(os.path.join(out_dir, "**", "*"),
                                      recursive=True)
                   if os.path.isfile(p))
    with open(outfile, "w") as f:
        json.dump({"process": pi, "losses": losses,
                   "checksum": checksum, "wrote": wrote,
                   "save_dir": result["save_dir"]}, f)


def run_driver_preempt(pi: int, pc: int, outfile: str) -> None:
    """Preemption signaled to ONLY ONE host of a live cluster: the
    collective flag agreement (multihost.agree_flag at every dispatch
    boundary) must stop EVERY process at the same step so the collective
    orbax save completes instead of deadlocking at its barrier — the
    exact hazard round 3 documented as unsolved. A second invocation
    auto-resumes and finishes the run."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pivp_tpu.config import TrainConfig
    from pivp_tpu.data import synthetic
    from pivp_tpu.training import loop, preemption

    out_dir = os.path.join(os.path.dirname(outfile), "run-shared")
    base = dict(
        output_dir=out_dir, event_log_dir=out_dir,
        sequence_length=4, context_frames=2,
        image_height=16, image_width=16, num_masks=3,
        schedsamp_k=-1.0, batch_size=4, train_val_split=1.0,
        validation_interval=100, save_interval=100, seed=0,
        checkpointer="orbax", prefetch=0)
    arrays = synthetic.generate_sequences(12, 4, 16, 16, seed=0)

    # Process 0 ALONE "receives SIGTERM" at its second dispatch boundary
    # (the flag is set exactly as the signal handler would set it;
    # process 1 never sees a local request). Deterministic stand-in for
    # a signal racing the loop.
    real_requested = preemption.requested
    if pi == 0:
        calls = {"n": 0}

        def fake():
            calls["n"] += 1
            if calls["n"] == 2:
                preemption.request()
            return real_requested()

        preemption.requested = fake

    r1 = loop.run_training(TrainConfig(num_iterations=6, **base),
                           arrays=arrays, run_name="podpre")
    preemption.requested = real_requested
    preemption.clear()
    step1 = int(jax.device_get(r1["state"].step))

    # Both processes exited the preempted run cleanly — resume to 6.
    r2 = loop.run_training(TrainConfig(num_iterations=6, **base),
                           arrays=arrays, run_name="podpre")
    step2 = int(jax.device_get(r2["state"].step))

    def checksum(params):
        return float(jax.device_get(jax.jit(
            lambda p: jax.tree_util.tree_reduce(
                jnp.add, jax.tree_util.tree_map(
                    lambda x: jnp.sum(jnp.abs(x)), p)))(params)))

    with open(outfile, "w") as f:
        json.dump({"process": pi,
                   "preempted1": bool(r1["preempted"]),
                   "preempted2": bool(r2["preempted"]),
                   "step1": step1, "step2": step2,
                   "checksum2": checksum(r2["state"].params)}, f)


def run_driver_orbax(pi: int, pc: int, outfile: str) -> None:
    """Collective orbax checkpointing on a real 2-process cluster: every
    process participates in the save barriers (shared run directory, as
    on a pod's shared filesystem), and a second driver invocation
    auto-resumes from the collectively-written checkpoint."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pivp_tpu.config import TrainConfig
    from pivp_tpu.data import synthetic
    from pivp_tpu.training import loop

    # SHARED directory across processes — orbax saves are collective.
    out_dir = os.path.join(os.path.dirname(outfile), "run-shared")
    base = dict(
        output_dir=out_dir, event_log_dir=out_dir,
        sequence_length=4, context_frames=2,
        image_height=16, image_width=16, num_masks=3,
        schedsamp_k=-1.0, batch_size=4, train_val_split=0.95,
        validation_interval=10, save_interval=1, seed=0,
        checkpointer="orbax", prefetch=0)
    arrays = synthetic.generate_sequences(12, 4, 16, 16, seed=0)

    def checksum(params):
        return float(jax.device_get(jax.jit(
            lambda p: jax.tree_util.tree_reduce(
                jnp.add, jax.tree_util.tree_map(
                    lambda x: jnp.sum(jnp.abs(x)), p)))(params)))

    r1 = loop.run_training(TrainConfig(num_iterations=4, **base),
                           arrays=arrays, run_name="podorbax")
    step1 = int(jax.device_get(r1["state"].step))

    # Second invocation, same run_name: resumes from the collective
    # checkpoint and trains on to 8 total iterations.
    r2 = loop.run_training(TrainConfig(num_iterations=8, **base),
                           arrays=arrays, run_name="podorbax")
    step2 = int(jax.device_get(r2["state"].step))

    from pivp_tpu.utils import orbax_ckpt
    mgr = orbax_ckpt.make_manager(
        os.path.join(out_dir, "podorbax", "orbax"))
    orbax_steps = sorted(int(s) for s in mgr.all_steps())

    losses1 = np.asarray(r1["global_losses"])[:, 0].tolist()
    losses2 = np.asarray(r2["global_losses"])[:, 0].tolist()
    with open(outfile, "w") as f:
        json.dump({"process": pi,
                   "step1": step1, "step2": step2,
                   "checksum1": checksum(r1["state"].params),
                   "checksum2": checksum(r2["state"].params),
                   "losses1": losses1, "losses2": losses2,
                   "orbax_steps": orbax_steps}, f)


if __name__ == "__main__":
    main()
