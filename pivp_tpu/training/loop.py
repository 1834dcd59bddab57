"""Training driver: the TPU-native equivalent of the reference's training
entry point (/root/reference/src/models/train_model.py:792-1049).

Capability parity:
  * map.csv in-RAM dataset + train/val split (813-845);
  * Adam optimizer, warm start from model/optimizer checkpoints (860-869)
    — with the reference's bug of loading the optimizer npz into the
    *model* (868) fixed: `pretrained_state` restores optimizer state;
  * iteration loop with per-epoch [mean, std, min, max, median] stats
    (965-979), validation sweeps (981-1021) and periodic checkpoints with
    metric curves + git-version stamp (1023-1041).

Reference bugs intentionally fixed (SURVEY.md §2.4):
  * `epoch+1 % validation_interval == 0` precedence (981) — validation now
    actually runs every `validation_interval` epochs;
  * the validation `xp.act_validation_set` crash (992);
  * the valid-PSNR curve clobbering the train-PSNR file (1041).

TPU-native behavior: one jitted train step (forward scan + backward +
Adam) with the batch sharded over the mesh's data axis; metric scalars are
fetched lazily so steps dispatch asynchronously.
"""

from __future__ import annotations

import logging
import os
import time
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from pivp_tpu import config as config_mod
from pivp_tpu.config import TrainConfig
from pivp_tpu.data import assembler
from pivp_tpu.data import dataset as dataset_lib
from pivp_tpu.parallel import mesh as mesh_lib
from pivp_tpu.parallel import multihost
from pivp_tpu.parallel import train_step as ts_lib
from pivp_tpu.training import preemption
from pivp_tpu.utils import checkpoint as ckpt_lib
from pivp_tpu.utils import logging_utils
from pivp_tpu.utils import profiling

logger = logging.getLogger(__name__)


def run_training(cfg: TrainConfig,
                 arrays: Optional[Tuple[np.ndarray, ...]] = None,
                 run_name: Optional[str] = None) -> Dict[str, object]:
    """Train a model; returns dict with final state, save_dir, curves.

    `arrays` overrides on-disk data with in-memory (images, actions,
    states) — used by tests and the synthetic path.
    """
    mcfg = cfg.model_config()

    if arrays is None:
        arrays = (dataset_lib.lazy_sequences(cfg.data_dir)
                  if cfg.lazy_load
                  else dataset_lib.load_sequences(cfg.data_dir))
    n_total = arrays[0].shape[0]
    train_arrays, val_arrays = dataset_lib.train_val_split(
        arrays, cfg.train_val_split)
    logger.info(
        "Data set contains %d sequences: %d train / %d validation",
        n_total, train_arrays[0].shape[0], val_arrays[0].shape[0])

    # Multi-host (pod) mode: when train_cli initialized
    # jax.distributed, every process runs this same driver; the batch is
    # assembled from per-host shards (parallel/multihost.py) and only
    # process 0 touches the filesystem. Single-process runs see
    # (pi, pc) == (0, 1) and none of this branches.
    pi, pc = multihost.process_info()
    is_primary = pi == 0
    spatial = cfg.spatial_parallel > 1
    if pc > 1:
        # Equal host shards keep every process's epoch schedule — and
        # therefore the collective validation sweeps — in lockstep.
        n_tr = train_arrays[0].shape[0]
        usable = n_tr - n_tr % pc
        if usable == 0:
            raise ValueError(f"{n_tr} train sequences cannot cover "
                             f"{pc} processes")
        if usable != n_tr:
            train_arrays = tuple(a[:usable] for a in train_arrays)
            logger.info("Multi-host: trimmed %d train rows for equal "
                        "host shards", n_tr - usable)
        n_dev = len(jax.devices())
        sp = cfg.spatial_parallel
        if n_dev % sp:
            raise ValueError(f"{n_dev} global devices not divisible by "
                             f"spatial_parallel={sp}")
        dp = n_dev // sp
        if cfg.batch_size % dp:
            raise ValueError(f"multi-host batch {cfg.batch_size} must "
                             f"divide the {dp} data-parallel shards")
        mesh = mesh_lib.make_mesh(model_parallel=sp)  # every device
        if spatial and not mesh_lib.model_axis_process_local(mesh):
            raise ValueError(
                "multi-host spatial_parallel requires each host's "
                "devices to cover whole model-axis rows (local device "
                "count divisible by spatial_parallel, process-ordered "
                "device ids)")
        logger.info("Mesh: %d-way data x %d-way spatial parallel over "
                    "%d processes (this is host %d)", dp, sp, pc, pi)
    elif spatial:
        sp = cfg.spatial_parallel
        avail = cfg.num_devices or len(jax.devices())
        if avail % sp:
            raise ValueError(f"{avail} devices not divisible by "
                             f"spatial_parallel={sp}")
        dp = mesh_lib.auto_num_devices(cfg.batch_size, avail // sp)
        mesh = mesh_lib.make_mesh(dp * sp, model_parallel=sp)
        logger.info("Mesh: %d-way data x %d-way spatial parallel", dp, sp)
    else:
        n_dev = mesh_lib.auto_num_devices(cfg.batch_size, cfg.num_devices)
        mesh = mesh_lib.make_mesh(n_dev)
        logger.info("Mesh: %d-way data parallel", n_dev)
    optimizer = ts_lib.make_optimizer(cfg.learning_rate)
    state = ts_lib.create_train_state(jax.random.PRNGKey(cfg.seed), mcfg,
                                      optimizer)

    if cfg.pretrained_model:
        state = state._replace(params=ckpt_lib.load_npz_into(
            cfg.pretrained_model, state.params))
        logger.info("Loaded pretrained model %s", cfg.pretrained_model)
    if cfg.pretrained_state:
        state = state._replace(opt_state=ckpt_lib.load_npz_into(
            cfg.pretrained_state, state.opt_state))
        logger.info("Loaded pretrained optimizer state %s",
                    cfg.pretrained_state)

    # steps_per_call == 0 resolves to auto: K=25 on TPU backends (one
    # host->device dispatch per 25 optimizer steps amortizes the ~50 ms
    # tunnel RTT that would otherwise dominate a ~40 ms step), clamped to
    # the epoch length and the run length; 1 elsewhere (CPU dispatch is
    # local and cheap, and K>1 only delays metrics).
    steps_per_call = cfg.steps_per_call
    if steps_per_call == 0:
        if config_mod.tpu_backend():
            epoch_batches = max(1, -(-train_arrays[0].shape[0]
                                     // cfg.batch_size))
            steps_per_call = max(1, min(25, epoch_batches,
                                        cfg.num_iterations))
        else:
            steps_per_call = 1
    logger.info("steps_per_call: %d%s", steps_per_call,
                " (auto)" if cfg.steps_per_call == 0 else "")

    train_step = (ts_lib.make_train_step(mcfg, optimizer, mesh,
                                         remat=cfg.remat,
                                         spatial_parallel=spatial,
                                         grad_accum=cfg.grad_accum)
                  if steps_per_call == 1 else None)
    train_multi = (ts_lib.make_train_multi(mcfg, optimizer, mesh,
                                           remat=cfg.remat,
                                           spatial_parallel=spatial,
                                           grad_accum=cfg.grad_accum)
                   if steps_per_call > 1 else None)
    eval_step = ts_lib.make_eval_step(mcfg, mesh, spatial_parallel=spatial)

    if run_name is None:
        run_name = "{0}-{1}-{2}".format(
            time.strftime("%Y%m%d-%H%M%S"), cfg.model_type, cfg.batch_size)
    if pc > 1:
        # Hosts can cross a second boundary during startup; collective
        # checkpointing needs every process on the same run directory.
        run_name = multihost.agree_string(run_name)
    save_dir = None

    itr = 0
    resumed_dir = None
    ckpt_manager = None
    if cfg.checkpointer == "orbax":
        from pivp_tpu.utils import orbax_ckpt

        # Collective: in multi-host runs EVERY process creates the
        # manager and participates in save/restore (orbax coordinates
        # through the jax.distributed KV store; cfg.output_dir must be a
        # shared filesystem on a pod).
        save_dir = ckpt_lib.prepare_run_dir(cfg.output_dir, run_name)
        ckpt_manager = orbax_ckpt.make_manager(
            os.path.join(save_dir, "orbax"))
        latest = ckpt_manager.latest_step()
        if latest is not None:
            # Restore via a host-side (numpy) template: values in the
            # checkpoint are replicated, so every process reads the full
            # arrays and feeds them to the jitted step exactly like a
            # fresh `create_train_state` — no sharded-restore machinery.
            state = orbax_ckpt.restore(ckpt_manager,
                                       jax.device_get(state))
            itr = int(state.step)
            resumed_dir = save_dir
            logger.info("Resumed from orbax checkpoint step %d in %s",
                        latest, save_dir)

    if pc > 1:
        # Each host draws only its own row shard; the global batch is
        # the concatenation over hosts (multihost.make_global_batch).
        batcher = multihost.HostShardedBatcher(
            train_arrays, cfg.batch_size, seed=cfg.seed,
            process_index=pi, process_count=pc)
    else:
        batcher = dataset_lib.EpochBatcher(train_arrays, cfg.batch_size,
                                           seed=cfg.seed)
    if itr:
        # Deterministic resume: replay the shuffle/epoch state to the
        # checkpointed step so the run draws exactly the batches the
        # uninterrupted run would have (one batch per optimizer step).
        batcher.seek(itr)
        logger.info("Fast-forwarded the data stream to iteration %d "
                    "(epoch %d)", itr, batcher.epoch)
    # Base sampling key. Per-step keys are fold_in(base, absolute
    # iteration) — invariant to steps_per_call grouping and to
    # checkpoint/resume boundaries.
    rng = jax.random.PRNGKey(cfg.seed + 1)

    (global_losses, global_psnr_all, global_losses_valid,
     global_psnr_all_valid) = _restore_curves(resumed_dir)

    epoch_start = time.time()
    last_metrics = None
    # Device-accurate per-dispatch timing in debug mode (host-fetch
    # barrier; block_until_ready is unreliable on remote-attached
    # runtimes — see utils/profiling.StepTimer).
    step_timer = profiling.StepTimer() if cfg.debug else None

    def flush_epoch(epoch: int, losses_np: np.ndarray,
                    psnr_np: np.ndarray, elapsed: float) -> None:
        nonlocal save_dir
        # Failure detection: catch divergence, save an emergency
        # checkpoint, and abort (no reference equivalent — its only
        # sanitizer was chainer debug-mode NaN checks).
        if cfg.nan_guard and not np.isfinite(losses_np).all():
            # The losses are replicated, so EVERY process enters this
            # branch — the orbax emergency save below stays collective.
            if is_primary or ckpt_manager is not None:
                save_dir = ckpt_lib.prepare_run_dir(cfg.output_dir,
                                                    run_name)
                _save_checkpoint(save_dir, f"nan-epoch{epoch}", state,
                                 global_losses, global_psnr_all,
                                 global_losses_valid,
                                 global_psnr_all_valid,
                                 manager=ckpt_manager,
                                 primary=is_primary)
            raise FloatingPointError(
                f"non-finite training loss at epoch {epoch}; emergency "
                f"checkpoint saved to {save_dir}")
        global_losses.append(logging_utils.epoch_stats(list(losses_np)))
        global_psnr_all.append(logging_utils.epoch_stats(list(psnr_np)))
        logger.info("[TRAIN] Epoch #: %d (%.2fs)  loss: %.6f  psnr: %.3f",
                    epoch, elapsed, losses_np.mean(), psnr_np.mean())
        if step_timer is not None and step_timer.times:
            logger.info("[TIMER] per-dispatch %s", step_timer.summary())
            step_timer.times.clear()
        _write_event(cfg.event_log_dir if is_primary else "", run_name, {
            "epoch": epoch, "iteration": itr,
            "train_loss": logging_utils.epoch_stats(list(losses_np)),
            "train_psnr": logging_utils.epoch_stats(list(psnr_np)),
            "elapsed_s": elapsed,
            "summaries": (logging_utils.frame_summaries("train",
                                                        last_metrics)
                          if "recon_costs" in (last_metrics or {})
                          else []),
        })

        # --- validation sweep (precedence bug fixed) ---------------------
        if (epoch % cfg.validation_interval == 0
                and val_arrays[0].shape[0] > 0):
            v = run_validation(eval_step, state.params, val_arrays,
                               cfg.batch_size, mcfg.state_cost_weight,
                               mesh, u8_transfer=cfg.u8_transfer,
                               process_index=pi, process_count=pc,
                               spatial=spatial)
            global_losses_valid.append(
                logging_utils.epoch_stats([v["loss"]]))
            global_psnr_all_valid.append(
                logging_utils.epoch_stats([v["psnr_all"]]))
            logger.info(
                "[VALID] Epoch #: %d  loss: %.6f  psnr: %.3f  "
                "per-image-psnr: %.3f dB  ssim: %.4f  (n=%d)",
                epoch, v["loss"], v["psnr_all"], v["psnr_per_image"],
                v["ssim"], v["n_sequences"])
            _write_event(cfg.event_log_dir if is_primary else "",
                         run_name, {
                "epoch": epoch, "iteration": itr, "split": "validation",
                "loss": logging_utils.epoch_stats([v["loss"]]),
                "psnr_all": logging_utils.epoch_stats([v["psnr_all"]]),
                "psnr_per_image": v["psnr_per_image"],
                "ssim": v["ssim"],
                "n_sequences": v["n_sequences"],
            })

        # --- periodic checkpoint ----------------------------------------
        # npz/curve files are primary-only; orbax saves are COLLECTIVE
        # (all processes reach this at the same epochs — the epoch
        # bookkeeping is replicated).
        if epoch % cfg.save_interval == 0 and (
                is_primary or ckpt_manager is not None):
            save_dir = ckpt_lib.prepare_run_dir(cfg.output_dir, run_name)
            _save_checkpoint(save_dir, epoch, state, global_losses,
                             global_psnr_all, global_losses_valid,
                             global_psnr_all_valid, manager=ckpt_manager,
                             primary=is_primary)

    # Input pipeline: batch assembly (index-gather + transpose + u8
    # quantization + optional device_put) runs in _produce_calls; with
    # cfg.prefetch > 0 a daemon thread keeps a bounded queue of ready
    # calls so host assembly overlaps device compute. Metric arrays are
    # kept as device values until the epoch flush — fetching them eagerly
    # would block the dispatch pipeline on every call.
    calls = _produce_calls(batcher, cfg, itr, mesh, steps_per_call,
                           process_count=pc)
    if cfg.prefetch > 0:
        calls = _Prefetcher(calls, cfg.prefetch)

    # Epoch bookkeeping is EXACT under K-step dispatch: the producer
    # marks, per dispatch, which step indices closed an epoch; per-step
    # losses come back as (K,) device arrays and are split at the true
    # boundary at flush time. The final short dispatch is padded to the
    # compiled K (masked on device via k_real — no K' recompile, no
    # phantom updates); only the first k real steps' metrics are used.
    stream: List[Tuple[jnp.ndarray, jnp.ndarray, int]] = []
    stream_marks: List[Tuple[int, int]] = []   # (absolute step, epoch)
    stream_len = 0
    if itr and resumed_dir:
        # A preempted run saved its partial-epoch step metrics; seeding
        # the stream with them makes the straddling epoch's flushed curve
        # row a FULL-epoch statistic, not just the post-resume steps.
        partial = _restore_partial_stream(resumed_dir, itr)
        if partial is not None:
            stream = [(partial[0], partial[1], len(partial[0]))]
            stream_len = len(partial[0])
            logger.info("Restored %d partial-epoch step metrics from the "
                        "preempted run", stream_len)

    restore_signals = (preemption.install() if cfg.graceful_preemption
                       else (lambda: None))
    preempted = False
    try:
        for payload, k, marks in calls:
            if steps_per_call > 1:
                # The compiled multi-step folds the base key by each
                # step's absolute iteration itself.
                state, metrics = train_multi(state, payload,
                                             jnp.float32(itr), rng, k)
            else:
                step_key = jax.random.fold_in(rng, itr)
                if step_timer is not None:
                    step_timer.start()
                state, metrics = train_step(state, payload,
                                            jnp.float32(itr), step_key)
                if step_timer is not None:
                    step_timer.stop(barrier_value=metrics["loss"])
                if cfg.debug and (itr < 3 or itr % 50 == 0):
                    logger.info("iter %d: loss=%.6f psnr=%.3f", itr,
                                float(metrics["loss"]),
                                float(metrics["psnr_all"]))
            # Device arrays appended lazily; forced at epoch flushes
            # only, so dispatches stay asynchronous.
            stream.append((metrics["loss"], metrics["psnr_all"], k))
            last_metrics = metrics
            for i, ep in marks:
                stream_marks.append((stream_len + i, ep))
            stream_len += k
            itr += k

            if stream_marks:
                losses_np = np.concatenate(
                    [np.atleast_1d(np.asarray(l, np.float64))[:kk]
                     for l, _, kk in stream])
                psnr_np = np.concatenate(
                    [np.atleast_1d(np.asarray(p, np.float64))[:kk]
                     for _, p, kk in stream])
                elapsed = time.time() - epoch_start
                prev = 0
                for n_flushed, (pos, ep) in enumerate(stream_marks):
                    flush_epoch(ep, losses_np[prev:pos + 1],
                                psnr_np[prev:pos + 1],
                                elapsed if n_flushed == 0 else 0.0)
                    prev = pos + 1
                tail_l, tail_p = losses_np[prev:], psnr_np[prev:]
                stream = ([(tail_l, tail_p, len(tail_l))]
                          if len(tail_l) else [])
                stream_marks = []
                stream_len = len(tail_l)
                epoch_start = time.time()

            # Collective preemption agreement: a SIGTERM delivered to
            # only SOME hosts must stop EVERY host at the same step, so
            # all processes reach the collective orbax save together
            # (the flag itself is process-local; see
            # training/preemption.py).
            stop = preemption.requested()
            if pc > 1:
                stop = multihost.agree_flag(stop)
            if stop:
                # Graceful preemption: checkpoint NOW (orbax keys by the
                # exact optimizer step, so auto-resume continues from
                # here with the seeked data stream and the fold_in
                # sampling keys reproducing the uninterrupted run).
                # Metrics of the current PARTIAL epoch are persisted
                # alongside the checkpoint (training-partial-epoch.npz)
                # and restored on resume, so the straddling epoch's
                # curve row stays a full-epoch statistic.
                preempted = True
                logger.warning("Preemption requested: checkpointing at "
                               "iteration %d and exiting", itr)
                break

        # Final checkpoint — written while the set-a-flag signal handlers
        # are STILL installed: a second SIGTERM during the (potentially
        # slow) save must not revert to default handling and kill the
        # process mid-write.
        if is_primary or ckpt_manager is not None:
            save_dir = ckpt_lib.prepare_run_dir(cfg.output_dir, run_name)
            _save_checkpoint(save_dir, batcher.epoch, state, global_losses,
                             global_psnr_all, global_losses_valid,
                             global_psnr_all_valid, final=not preempted,
                             manager=ckpt_manager, primary=is_primary,
                             tag=(f"preempt-itr{itr}" if preempted
                                  else None))
            if is_primary:
                # Persist the not-yet-flushed partial-epoch metrics for
                # ANY final save — a run ending mid-epoch at
                # num_iterations and later extended resumes exactly like
                # a preempted one.
                _save_partial_stream(save_dir, stream, itr)
    finally:
        restore_signals()
        if preempted and isinstance(calls, _Prefetcher):
            calls.close()

    return {
        "state": state,
        "save_dir": save_dir,
        "run_name": run_name,
        "preempted": preempted,
        "global_losses": np.asarray(global_losses),
        "global_psnr_all": np.asarray(global_psnr_all),
        "last_metrics": last_metrics,
        "model_config": mcfg,
    }


def run_validation(eval_step, params, val_arrays, batch_size: int,
                   state_cost_weight: float, mesh=None,
                   u8_transfer: bool = False, process_index: int = 0,
                   process_count: int = 1,
                   spatial: bool = False) -> Dict[str, float]:
    """One exact validation sweep.

    Aggregates per-(frame, sequence) metric matrices from the eval step,
    masking the padded duplicate rows of the final partial batch, so every
    metric is invariant to batch_size (a per-batch-mean average would
    count padding at full weight — with 14 sequences and batch 32 that's
    18 phantom copies of one sequence).
    """
    recon_cols, state_cols, ssim_cols = [], [], []
    for vbatch, n_valid in dataset_lib.eval_batches(val_arrays,
                                                    batch_size):
        if u8_transfer:
            vbatch = (_quantize_images(vbatch[0]), vbatch[1], vbatch[2])
        if process_count > 1:
            # Every host sees the full val set; each contributes only
            # its column range of the (identical) global eval batch, so
            # the collective program runs on the same data everywhere.
            lbs = batch_size // process_count
            cols = slice(process_index * lbs, (process_index + 1) * lbs)
            vbatch = tuple(a[:, cols] for a in vbatch)
            vbatch = multihost.make_global_batch(mesh, vbatch,
                                                 batch_size,
                                                 spatial=spatial)
        elif mesh is not None:
            vbatch = mesh_lib.shard_batch(mesh, vbatch, spatial=spatial)
        out = eval_step(params, vbatch, jax.random.PRNGKey(0))
        recon_cols.append(np.asarray(out["recon_mse_tb"])[:, :n_valid])
        state_cols.append(np.asarray(out["state_mse_tb"])[:, :n_valid])
        ssim_cols.append(np.asarray(out["ssim_tb"])[:, :n_valid])
    recon = np.concatenate(recon_cols, axis=1)       # (T-ctx, N_val)
    state_mse = np.concatenate(state_cols, axis=1)
    ssim_tb = np.concatenate(ssim_cols, axis=1)
    num_pred = recon.shape[0]
    frame_mse = recon.mean(axis=1)
    loss = float((frame_mse.sum()
                  + state_cost_weight * state_mse.mean(axis=1).sum())
                 / num_pred)
    return {
        "loss": loss,
        # Reference batch-PSNR convention, over the full val set.
        "psnr_all": float(np.sum(10.0 * np.log10(1.0 / frame_mse))),
        "psnr_per_image": float(np.mean(10.0 * np.log10(1.0 / recon))),
        "ssim": float(ssim_tb.mean()),
        "n_sequences": int(recon.shape[1]),
    }


def _staging_budget_bytes() -> int:
    """HBM budget for producer-side staged payloads (all queued calls
    together). With prefetch, up to (prefetch+1) payloads are device-
    resident at once; past this budget the producer yields host arrays
    and the transfer happens at dispatch instead (slower pipeline, no
    RESOURCE_EXHAUSTED). 2 GB default leaves the 16 GB v5e HBM to
    weights/activations even at the T=30 full-unroll config."""
    return int(os.environ.get("PIVP_STAGING_BUDGET_MB", "2048")) << 20


def _producer_staging_ok(payload_bytes: int, prefetch: int) -> bool:
    return (prefetch + 1) * payload_bytes <= _staging_budget_bytes()


def _produce_calls(batcher, cfg: TrainConfig, start_itr: int, mesh,
                   steps_per_call: int, process_count: int = 1):
    """Yield (payload, k_real, marks) device-call descriptions.

    payload is one batch (steps_per_call == 1) or K stacked batches, u8-
    quantized if configured and already device_put when the mesh is
    multi-device. `marks` lists (step_index_within_dispatch, epoch) for
    every step that CLOSED an epoch — the consumer splits per-step metric
    arrays exactly there. The final dispatch of a run is padded to K by
    repeating its last batch; k_real counts the real steps (the device
    masks updates past it, the consumer slices metrics to it).

    Runs on the prefetch thread when cfg.prefetch > 0, so everything here
    (gather + stack + quantize + transfer start) overlaps device compute.
    """
    itr = start_itr
    staging_warned = False
    while itr < cfg.num_iterations:
        if steps_per_call > 1:
            k = min(steps_per_call, cfg.num_iterations - itr)
            idx_rows = []
            marks = []
            for i in range(k):
                idx_rows.append(batcher.next_indices())
                if batcher.is_new_epoch:
                    marks.append((i, batcher.epoch))
            if k < steps_per_call:        # pad to the compiled K
                idx_rows += [idx_rows[-1]] * (steps_per_call - k)
            # Fused gather+transpose+quantize — one pass via the native
            # assembler when available (numpy fallback is bit-identical;
            # see data/assembler.py).
            stacked = assembler.assemble_calls(
                batcher.arrays, np.stack(idx_rows), cfg.u8_transfer)
            # Start the host->device transfer here (device_put is
            # async): on the prefetch thread it overlaps the previous
            # call's compute — the upload is the dominant per-call cost
            # on tunnel-attached devices. Staging is an optimization,
            # not a requirement, so it is gated on an explicit HBM
            # budget (_producer_staging_ok): (prefetch+1) payloads live
            # in HBM at once — ~100 MB each u8 at the bench config, but
            # f32 frames or long-T/big-batch u8 can reach GBs and
            # RESOURCE_EXHAUSTED. Over budget, the payload is yielded
            # as host arrays and transfers at dispatch.
            payload_bytes = sum(int(a.nbytes) for a in stacked)
            stage = _producer_staging_ok(payload_bytes, cfg.prefetch)
            if not stage and cfg.u8_transfer and not staging_warned:
                staging_warned = True
                logger.info(
                    "producer-side HBM staging disabled: %d staged "
                    "payloads x %.0f MB exceeds the %d MB budget "
                    "(PIVP_STAGING_BUDGET_MB); transferring at dispatch",
                    cfg.prefetch + 1, payload_bytes / 2**20,
                    _staging_budget_bytes() >> 20)
            if process_count > 1:
                # Pod path: every process contributes its local rows of
                # the global batch (spans processes — plain device_put
                # cannot build such an array).
                stacked = multihost.make_global_batch(
                    mesh, stacked, cfg.batch_size, batch_axis=2,
                    spatial=cfg.spatial_parallel > 1)
            elif mesh.size > 1 and stage:
                # Optional here too: the jitted multi-step declares
                # in_shardings, so a host payload shards at dispatch.
                stacked = jax.device_put(stacked, mesh_lib.call_shardings(
                    mesh, spatial=cfg.spatial_parallel > 1))
            elif cfg.u8_transfer and stage:
                stacked = jax.device_put(stacked)
            yield stacked, k, marks
            itr += k
        else:
            batch = batcher.next()
            marks = ([(0, batcher.epoch)] if batcher.is_new_epoch else [])
            if cfg.u8_transfer:
                batch = (_quantize_images(batch[0]), batch[1], batch[2])
            # Same HBM-staging policy as the K-path: device_put on the
            # producer thread only for u8 payloads or multi-device
            # sharding, and only within the staging budget; otherwise
            # the batch transfers at dispatch.
            payload_bytes = sum(int(a.nbytes) for a in batch)
            stage = _producer_staging_ok(payload_bytes, cfg.prefetch)
            if process_count > 1:
                batch = multihost.make_global_batch(
                    mesh, batch, cfg.batch_size,
                    spatial=cfg.spatial_parallel > 1)
            elif (mesh.size > 1 or cfg.u8_transfer) and stage:
                batch = mesh_lib.shard_batch(
                    mesh, batch, spatial=cfg.spatial_parallel > 1)
            yield batch, 1, marks
            itr += 1


class _Prefetcher:
    """Bounded-queue iterator: a daemon thread drains `gen` ahead of the
    consumer (depth items max). Exceptions re-raise on the consumer side;
    order is exactly the generator's, so training is bit-identical with
    prefetching on or off (tested). `close()` unblocks and retires the
    producer — the consumer must call it when leaving the loop early
    (nan-guard abort, exception), else the thread would pin queued
    device buffers for the rest of the process."""

    _DONE = object()

    def __init__(self, gen, depth: int):
        import queue
        import threading

        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
        self._stop = threading.Event()
        self._thread = threading.Thread(
            target=self._run, args=(gen,), daemon=True,
            name="pivp-input-prefetch")
        self._thread.start()

    def _put(self, item) -> bool:
        import queue

        while not self._stop.is_set():
            try:
                self._q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def _run(self, gen):
        try:
            for item in gen:
                if not self._put(item):
                    return
            self._put(self._DONE)
        except BaseException as e:  # surface on the consumer thread
            self._put(e)

    def close(self) -> None:
        """Stop the producer and drop queued payloads (frees any device
        buffers it staged). Drains AGAIN after the thread dies: an
        in-flight _q.put() racing the first drain can land one more item,
        which would otherwise pin its device buffers until GC."""
        import queue

        def drain():
            try:
                while True:
                    self._q.get_nowait()
            except queue.Empty:
                pass

        self._stop.set()
        deadline = time.time() + 10.0
        while True:
            drain()
            self._thread.join(timeout=0.5)
            if not self._thread.is_alive() or time.time() > deadline:
                break
        drain()

    def __iter__(self):
        try:
            while True:
                item = self._q.get()
                if item is self._DONE:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            self.close()


_CURVE_FILES = ("training-global_losses", "training-global_psnr_all",
                "training-global_losses_valid",
                "training-global_psnr_all_valid")


def _restore_curves(resumed_dir: Optional[str]
                    ) -> Tuple[List[List[float]], ...]:
    """Seed the per-epoch metric-curve lists from a resumed run's saved
    .npy files (when present), so checkpoints written after an orbax
    auto-resume carry the FULL training history, not just the
    post-resume epochs."""
    curves = []
    for name in _CURVE_FILES:
        path = os.path.join(resumed_dir or "", name + ".npy")
        if resumed_dir and os.path.exists(path):
            arr = np.load(path)
            curves.append([list(map(float, row)) for row in arr])
        else:
            curves.append([])
    if resumed_dir and any(curves):
        logger.info("Restored %s prior epoch curve rows from %s",
                    [len(c) for c in curves], resumed_dir)
    return tuple(curves)


_PARTIAL_STREAM_FILE = "training-partial-epoch.npz"


def _save_partial_stream(save_dir: str, stream, itr: int) -> None:
    """Persist the not-yet-flushed per-step metrics of the epoch a
    preemption interrupted (keyed by the exact iteration), so the resumed
    run can complete that epoch's curve row instead of computing it from
    only the post-resume steps."""
    path = os.path.join(save_dir, _PARTIAL_STREAM_FILE)
    if not stream:
        # The run ended exactly at an epoch boundary: drop any stale
        # file from an earlier preemption so nothing can mis-restore.
        if os.path.exists(path):
            os.remove(path)
        return
    losses = np.concatenate(
        [np.atleast_1d(np.asarray(l, np.float64))[:k] for l, _, k in stream])
    psnrs = np.concatenate(
        [np.atleast_1d(np.asarray(p, np.float64))[:k] for _, p, k in stream])
    np.savez(path, losses=losses, psnrs=psnrs, itr=np.int64(itr))


def _restore_partial_stream(resumed_dir: str, itr: int):
    """(losses, psnrs) saved by `_save_partial_stream` — only when they
    belong to exactly the resumed iteration (otherwise stale)."""
    path = os.path.join(resumed_dir, _PARTIAL_STREAM_FILE)
    if not os.path.exists(path):
        return None
    with np.load(path) as d:
        if int(d["itr"]) != itr:
            return None
        return np.asarray(d["losses"]), np.asarray(d["psnrs"])


def _quantize_images(images: np.ndarray) -> np.ndarray:
    """[0,1] float frames -> uint8 for the host->device transfer
    (dequantized on device in rollout; see TrainConfig.u8_transfer).
    Numpy mirror of ops/transforms.quantize_frames_u8 (kept host-side on
    purpose — it runs on the prefetch thread); same rounding/clipping."""
    return np.clip(images * 255.0 + 0.5, 0.0, 255.0).astype(np.uint8)


def _write_event(event_log_dir: str, run_name: str, record: Dict) -> None:
    """Append one JSON line of epoch telemetry. Functional replacement of
    the reference's --event_log_dir flag, which existed but was never
    used (train_model.py:775); summaries follow its Model.summaries
    naming (744-759)."""
    if not event_log_dir:
        return
    import json

    os.makedirs(event_log_dir, exist_ok=True)
    path = os.path.join(event_log_dir, f"{run_name}-events.jsonl")
    with open(path, "a") as f:
        f.write(json.dumps(record) + "\n")


def _save_checkpoint(save_dir: str, epoch: int, state, global_losses,
                     global_psnr_all, global_losses_valid,
                     global_psnr_all_valid, final: bool = False,
                     manager=None, primary: bool = True,
                     tag: Optional[str] = None) -> None:
    """Write the reference npz/curve artifacts (primary process only) and,
    when an orbax manager is given, a collective orbax checkpoint (every
    process must call this — orbax barriers across the cluster)."""
    if tag is None:
        tag = "final" if final else str(epoch)
    if primary:
        ckpt_lib.save_npz(os.path.join(save_dir, f"training-{tag}"),
                          jax.device_get(state.params))
        ckpt_lib.save_npz(os.path.join(save_dir, f"state-{tag}"),
                          jax.device_get(state.opt_state))
    if manager is not None:
        from pivp_tpu.utils import orbax_ckpt

        orbax_ckpt.save(manager, int(state.step),
                        jax.device_get(state))
    if not primary:
        return
    np.save(os.path.join(save_dir, "training-global_losses"),
            np.asarray(global_losses))
    np.save(os.path.join(save_dir, "training-global_psnr_all"),
            np.asarray(global_psnr_all))
    np.save(os.path.join(save_dir, "training-global_losses_valid"),
            np.asarray(global_losses_valid))
    # NOTE: written to its own file — the reference overwrote the train
    # PSNR curve here (train_model.py:1041).
    np.save(os.path.join(save_dir, "training-global_psnr_all_valid"),
            np.asarray(global_psnr_all_valid))
    logger.info("Saved checkpoint at epoch %s to %s", tag, save_dir)
