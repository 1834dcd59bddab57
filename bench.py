"""Benchmark: training-step throughput of the flagship CDNA model on the
reference benchmark config (batch 32, T=10 64x64 frames, context 2,
scheduled sampling k=900 — /root/reference/src/models/train_model.py:779-787
defaults).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

vs_baseline is measured against a single-process CPU training step of the
same model (the reference is a single-device Chainer program with a CPU
default; an XLA-CPU step is a *stronger* baseline than Chainer's
define-by-run CPU execution, so the reported ratio is a conservative lower
bound on the vs-reference speedup). The north-star target is >=10x
(BASELINE.json).
"""

from __future__ import annotations

import json
import time

import numpy as np

# Measured with tools/measure_cpu_baseline.py on this machine (XLA CPU,
# same model/config, jitted train step): see that script's output.
CPU_BASELINE_FRAMES_PER_SEC = 33.4

BATCH = 32
SEQ = 10
CONTEXT = 2
STEPS = 20


def main() -> None:
    import jax
    import jax.numpy as jnp

    from pivp_tpu.config import ModelConfig
    from pivp_tpu.data import dataset as dataset_lib
    from pivp_tpu.data import synthetic
    from pivp_tpu.parallel import mesh as mesh_lib
    from pivp_tpu.parallel import train_step as ts_lib

    cfg = ModelConfig(model_type="CDNA", num_masks=10,
                      sequence_length=SEQ, context_frames=CONTEXT,
                      scheduled_sampling_k=900.0)
    mesh = mesh_lib.make_mesh()
    opt = ts_lib.make_optimizer(1e-3)
    state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = ts_lib.make_train_step(cfg, opt, mesh)

    imgs, acts, stas = synthetic.generate_sequences(BATCH, SEQ)
    batch = mesh_lib.shard_batch(
        mesh, dataset_lib.to_time_major(imgs, acts, stas))

    rng = jax.random.PRNGKey(1)
    # Warmup / compile.
    state, metrics = step(state, batch, jnp.float32(0.0), rng)
    jax.block_until_ready(metrics["loss"])

    t0 = time.perf_counter()
    for i in range(STEPS):
        state, metrics = step(state, batch, jnp.float32(i + 1), rng)
    jax.block_until_ready(metrics["loss"])
    dt = time.perf_counter() - t0

    steps_per_sec = STEPS / dt
    # Frames: predicted frames per optimizer step (8 per sequence at the
    # reference defaults), matching BASELINE.json's "10-step rollout
    # frames/sec/chip".
    frames_per_sec = steps_per_sec * BATCH * (SEQ - CONTEXT)
    n_chips = len(jax.devices())

    result = {
        "metric": "CDNA b32 T10 64x64 train throughput (predicted frames/s/chip)",
        "value": round(frames_per_sec / n_chips, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(
            (frames_per_sec / n_chips) / CPU_BASELINE_FRAMES_PER_SEC, 2),
        "steps_per_sec": round(steps_per_sec, 3),
        "devices": n_chips,
        "loss": float(np.asarray(metrics["loss"])),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
