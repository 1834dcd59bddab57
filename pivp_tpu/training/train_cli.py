"""Training CLI — same 19 public flags (names, types, defaults) as the
reference entry point (/root/reference/src/models/train_model.py:772-791),
plus TPU-native extras: --seed, --image_height/--image_width,
--compute_dtype, --lstm_gate_compute, --num_devices,
--spatial_parallel, --remat,
--use_pallas, --fused_cdna, --merge_output_convs, --steps_per_call,
--scan_unroll, --prefetch,
--grad_accum, --lazy_load, --u8_transfer, --checkpointer, --synthetic,
--profile_dir, --run_name, --graceful_preemption, --reference_literal,
and the multi-host (pod) trio
--coordinator_address/--num_processes/--process_id (full descriptions:
docs/commands.md).

Usage: python -m pivp_tpu.training.train_cli [OPTIONS]
"""

from __future__ import annotations

import logging

import click

from pivp_tpu.config import TrainConfig
from pivp_tpu.utils import logging_utils


@click.command()
@click.option('--data_dir', type=click.Path(),
              default='data/processed/brain-robotics-data/push/push_train',
              help='Directory containing data.')
@click.option('--output_dir', type=click.Path(), default='models',
              help='Directory for model checkpoints.')
@click.option('--event_log_dir', type=click.Path(), default='models',
              help='Directory for writing summary.')
@click.option('--num_iterations', type=click.INT, default=100000,
              help='Number of training iterations.')
@click.option('--pretrained_model', type=click.Path(), default='',
              help='Filepath of a pretrained model to initialize from.')
@click.option('--pretrained_state', type=click.Path(), default='',
              help='Filepath of a pretrained optimizer state to '
                   'initialize from.')
@click.option('--sequence_length', type=click.INT, default=10,
              help='Sequence length, including context frames.')
@click.option('--context_frames', type=click.INT, default=2,
              help='Number of frames before predictions.')
@click.option('--use_state', type=click.INT, default=1,
              help='Whether or not to give the state+action to the model.')
@click.option('--model_type', type=click.STRING, default='CDNA',
              help='Model architecture to use - CDNA, DNA, or STP.')
@click.option('--num_masks', type=click.INT, default=10,
              help='Number of masks, usually 1 for DNA, 10 for CDNA, STP.')
@click.option('--schedsamp_k', type=click.FLOAT, default=900.0,
              help='The k parameter for scheduled sampling. -1 for none.')
@click.option('--train_val_split', type=click.FLOAT, default=0.95,
              help='The percentage of data to use for the training set.')
@click.option('--batch_size', type=click.INT, default=32,
              help='Batch size for training.')
@click.option('--learning_rate', type=click.FLOAT, default=0.001,
              help='The base learning rate of the generator.')
@click.option('--gpu', type=click.INT, default=-1,
              help='Accepted for reference CLI compatibility; device '
                   'selection is mesh-based on TPU (see --num_devices).')
@click.option('--validation_interval', type=click.INT, default=200,
              help='How often (epochs) to run the validation sweep.')
@click.option('--save_interval', type=click.INT, default=50,
              help='How often (epochs) to save a model checkpoint.')
@click.option('--debug', type=click.INT, default=0, help='Debug mode.')
# --- TPU-native extras ---------------------------------------------------
@click.option('--seed', type=click.INT, default=0, help='PRNG seed.')
@click.option('--compute_dtype', type=click.STRING, default='auto',
              help='auto (bfloat16 on TPU, float32 elsewhere), float32, '
                   'or bfloat16. Pass float32 for reference-exact '
                   'numerics.')
@click.option('--num_devices', type=click.INT, default=0,
              help='Data-parallel devices (0 = all visible).')
@click.option('--spatial_parallel', type=click.INT, default=1,
              help='Spatial (image-height) model-parallel ways, on top '
                   'of data parallelism: GSPMD shards every conv over '
                   'the mesh model axis with halo exchanges on ICI. '
                   '1 = off. Needs (image_height//8)/ways >= 4.')
@click.option('--remat', type=click.INT, default=0,
              help='Rematerialize the scan step (memory for FLOPs).')
@click.option('--use_pallas', type=click.INT, default=-1,
              help='Pallas local-kernel-apply op: -1 auto (on for TPU '
                   'backends), 0 off, 1 on.')
@click.option('--fused_cdna', type=click.INT, default=1,
              help='Fuse the CDNA transform + mask composite into one '
                   'per-pixel kernel (algebraically exact).')
@click.option('--merge_output_convs', type=click.INT, default=1,
              help='Evaluate the masks deconv and the head enc7 deconv '
                   'as ONE conv over concatenated output channels '
                   '(algebraically exact; both are latency-bound '
                   'small-N 1x1 convs on enc6).')
@click.option('--pad_gate_convs', type=click.STRING, default='auto',
              help='Forward-only MXU input-channel padding of the '
                   'ConvLSTM gate convs (exact): auto = on for '
                   'batch <= 48 (measured: -3.4%% at b32, loses at '
                   'b64/b128), 0 off, 1 on.')
@click.option('--u8_transfer', type=click.INT, default=1,
              help='Ship frames to the device as uint8, dequantize '
                   'on-device (4x less host->device traffic).')
@click.option('--steps_per_call', type=click.INT, default=0,
              help='Optimizer steps per device dispatch (amortizes host '
                   'latency). 0 = auto (25 on TPU, 1 elsewhere); '
                   '1 = one dispatch per iteration.')
@click.option('--scan_unroll', type=click.INT, default=0,
              help='Time-scan unroll: 0 auto (full on TPU), 1 rolled, '
                   'N partial.')
@click.option('--prefetch', type=click.INT, default=2,
              help='Input-pipeline prefetch depth (0 = assemble batches '
                   'on the main thread).')
@click.option('--grad_accum', type=click.INT, default=1,
              help='Gradient-accumulation microbatches per step (exact '
                   'for the mean loss; peak HBM scales with batch/N).')
@click.option('--lazy_load', type=click.INT, default=0,
              help='Read sequences from disk per batch instead of '
                   'loading the whole dataset into RAM.')
@click.option('--lstm_gate_compute', type=click.STRING, default='auto',
              help='ConvLSTM gate precision: auto (compute dtype under '
                   'bf16, -8.6%% step time), compute, or float32 '
                   '(reference-exact).')
@click.option('--synthetic', type=click.INT, default=0,
              help='Train on N synthetic sequences instead of data_dir.')
@click.option('--profile_dir', type=click.Path(), default='',
              help='If set, capture a jax.profiler trace of the WHOLE '
                   'run — keep num_iterations small; summarize with '
                   'tools/trace_top_ops.py.')
@click.option('--checkpointer', type=click.Choice(['npz', 'orbax']),
              default='npz',
              help='npz = reference artifact contract; orbax adds atomic '
                   'step-managed TrainState checkpoints + auto-resume.')
@click.option('--run_name', type=click.STRING, default='',
              help='Run directory name (default: timestamped). Reuse a '
                   'name with --checkpointer orbax to resume that run.')
@click.option('--graceful_preemption', type=click.INT, default=1,
              help='Catch SIGTERM/SIGINT (TPU maintenance events, spot '
                   'reclaims), checkpoint at the next dispatch boundary '
                   'and exit cleanly; with --checkpointer orbax the next '
                   'launch auto-resumes from the exact optimizer step.')
@click.option('--reference_literal', type=click.INT, default=0,
              help='Train with the reference Chainer implementation\'s '
                   'LITERAL semantics (detached scheduled sampling, '
                   'mask-softmax scramble, DNA border zeroing, shared '
                   'STP params). 0 (default) = original-TF-intent '
                   'semantics. Combine with --compute_dtype float32 '
                   'for reference-exact numerics.')
@click.option('--coordinator_address', type=click.STRING, default='',
              help='Multi-host (pod) mode: host:port of process 0. '
                   'Launch one identical process per host, each with '
                   '--num_processes and its own --process_id; batches '
                   'are assembled from per-host shards; npz artifacts '
                   'are written by process 0, orbax checkpoints '
                   'collectively (shared filesystem). Empty (default) '
                   '= single-process, or auto-detect a cluster env.')
@click.option('--num_processes', type=click.INT, default=0,
              help='Multi-host: total process count (with '
                   '--coordinator_address).')
@click.option('--process_id', type=click.INT, default=-1,
              help='Multi-host: this process\'s id in [0, '
                   'num_processes).')
def main(data_dir, output_dir, event_log_dir, num_iterations,
         pretrained_model, pretrained_state, sequence_length,
         context_frames, use_state, model_type, num_masks, schedsamp_k,
         train_val_split, batch_size, learning_rate, gpu,
         validation_interval, save_interval, debug, seed, compute_dtype,
         num_devices, spatial_parallel, remat, use_pallas, fused_cdna,
         merge_output_convs, pad_gate_convs, u8_transfer,
         steps_per_call, scan_unroll, prefetch, grad_accum, lazy_load,
         lstm_gate_compute, synthetic, profile_dir, checkpointer,
         run_name, graceful_preemption, reference_literal,
         coordinator_address, num_processes, process_id):
    """Train the video prediction model on processed robot-push data."""
    logging_utils.setup_logging(
        logging.DEBUG if debug else logging.INFO)
    logger = logging.getLogger(__name__)

    from pivp_tpu.utils import compile_cache
    compile_cache.enable()

    # Multi-host init MUST precede any backend touch (model_config()
    # queries the backend below). No-op for plain single-host runs.
    from pivp_tpu.parallel import multihost
    if coordinator_address:
        multihost.initialize(coordinator_address, num_processes,
                             process_id)
        logger.info('Multi-host: process %d/%d',
                    *multihost.process_info())
    else:
        multihost.initialize()     # cluster-env auto-detection

    if debug:
        import jax
        jax.config.update("jax_debug_nans", True)

    cfg = TrainConfig(
        data_dir=data_dir, output_dir=output_dir,
        event_log_dir=event_log_dir, num_iterations=num_iterations,
        pretrained_model=pretrained_model,
        pretrained_state=pretrained_state,
        sequence_length=sequence_length, context_frames=context_frames,
        use_state=bool(use_state), model_type=model_type,
        num_masks=num_masks, schedsamp_k=schedsamp_k,
        train_val_split=train_val_split, batch_size=batch_size,
        learning_rate=learning_rate,
        validation_interval=validation_interval,
        save_interval=save_interval, debug=bool(debug), seed=seed,
        compute_dtype=compute_dtype, num_devices=num_devices,
        spatial_parallel=spatial_parallel,
        remat=bool(remat), use_pallas=use_pallas,
        fused_cdna=bool(fused_cdna),
        merge_output_convs=bool(merge_output_convs),
        pad_gate_convs=pad_gate_convs,
        u8_transfer=bool(u8_transfer),
        steps_per_call=steps_per_call, scan_unroll=scan_unroll,
        prefetch=prefetch, grad_accum=grad_accum,
        lazy_load=bool(lazy_load), lstm_gate_compute=lstm_gate_compute,
        checkpointer=checkpointer,
        graceful_preemption=bool(graceful_preemption),
        reference_literal=bool(reference_literal),
    )

    mcfg = cfg.model_config()
    logger.info('Training the model')
    logger.info('Model: %s', model_type)
    logger.info('# Minibatch-size: %s', batch_size)
    logger.info('# Num iterations: %s', num_iterations)
    logger.info('Compute dtype: %s  pallas: %s  fused_cdna: %s  '
                'u8_transfer: %s', mcfg.compute_dtype, mcfg.use_pallas,
                mcfg.fused_cdna, cfg.u8_transfer)

    arrays = None
    if synthetic:
        from pivp_tpu.data import synthetic as synth
        arrays = synth.generate_sequences(
            synthetic, sequence_length, seed=seed)
        logger.info('Using %d synthetic sequences', synthetic)

    from pivp_tpu.training import loop
    from pivp_tpu.utils import profiling

    with profiling.trace(profile_dir):
        result = loop.run_training(cfg, arrays=arrays,
                                   run_name=run_name or None)
    logger.info('Done; checkpoints in %s', result["save_dir"])


if __name__ == '__main__':
    main()
