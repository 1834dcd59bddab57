"""Benchmark matrix over the BASELINE.json config list: CDNA/DNA/STP
variants + the scheduled-sampling b32 config. Prints one JSON line per
config (same schema as bench.py).

Run: python tools/bench_matrix.py [--quick]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench import CPU_BASELINE_FRAMES_PER_SEC  # noqa: E402
from pivp_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pivp_tpu.config import ModelConfig  # noqa: E402
from pivp_tpu.data import synthetic  # noqa: E402
from pivp_tpu.parallel import train_step as ts_lib  # noqa: E402

SEQ, CONTEXT, K, ROUNDS = 10, 2, 25, 2

CONFIGS = [
    # (tag, model_type, num_masks, batch, schedsamp_k)
    ("CDNA b8 ctx2 8-step rollout", "CDNA", 10, 8, -1.0),
    ("DNA b32 per-pixel kernels", "DNA", 1, 32, 900.0),
    ("STP b32 affine params", "STP", 10, 32, 900.0),
    ("CDNA b32 k-annealed sched-sampling", "CDNA", 10, 32, 900.0),
]


def bench_config(tag, model_type, num_masks, batch, k_sched):
    cfg = ModelConfig(model_type=model_type, num_masks=num_masks,
                      sequence_length=SEQ, context_frames=CONTEXT,
                      scheduled_sampling_k=k_sched,
                      compute_dtype="bfloat16",
                      use_pallas=model_type != "STP",
                      scan_unroll=SEQ - 1,
                      lstm_gate_compute="compute")
    opt = ts_lib.make_optimizer(1e-3)
    state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    multi = ts_lib.make_train_multi(cfg, opt, mesh=None)

    imgs, acts, stas = synthetic.generate_sequences(batch * K, SEQ)

    def stack(x):
        return np.ascontiguousarray(
            x.reshape(K, batch, *x.shape[1:]).swapaxes(1, 2))

    batches = jax.tree_util.tree_map(
        jnp.asarray, tuple(stack(a) for a in (imgs, acts, stas)))

    state, m = multi(state, batches, jnp.float32(0.0),
                     jax.random.PRNGKey(1))
    float(np.asarray(m["loss"])[-1])
    t0 = time.perf_counter()
    for r in range(ROUNDS):
        state, m = multi(state, batches, jnp.float32((r + 1) * K),
                         jax.random.PRNGKey(1))
    final_loss = float(np.asarray(m["loss"])[-1])
    dt = time.perf_counter() - t0

    sps = ROUNDS * K / dt
    fps = sps * batch * (SEQ - CONTEXT)
    print(json.dumps({
        "metric": f"{tag} train throughput",
        "value": round(fps, 2),
        "unit": "frames/s/chip",
        "vs_baseline": round(fps / CPU_BASELINE_FRAMES_PER_SEC, 2),
        "steps_per_sec": round(sps, 3),
        "ms_per_step": round(1000 / sps, 2),
        "final_loss": final_loss,
    }), flush=True)


if __name__ == "__main__":
    for spec in CONFIGS:
        bench_config(*spec)
