"""Round-4 b32 schedule experiment (VERDICT r3 #4): interleaved
dual-microbatch execution.

The round-3 trace analysis put ~7.2 ms/step of the b32 CDNA train step
in elementwise loop fusions that can't feed the MXU. Splitting the batch
into two independent B=16 forward+backward branches and UNROLLING the
accumulation (grad_accum=2, grad_accum_unroll=True) hands XLA's
latency-hiding scheduler two disjoint subgraphs chained only by the
gradient adds — if it can overlap one branch's vector-unit fusions with
the other's MXU convolutions, the step gets faster with zero new
kernels. This tool measures that against the unsplit baseline and the
sequential (scan) grad_accum at the exact bench.py config; accept at
>=5% step win, else the numbers go to BENCHMARKS.md as
rejected-with-receipts next to the Pallas gate kernel.

Run on TPU: python tools/bench_interleave.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from pivp_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pivp_tpu.config import ModelConfig  # noqa: E402
from pivp_tpu.data import synthetic  # noqa: E402
from pivp_tpu.parallel import train_step as ts_lib  # noqa: E402

BATCH, SEQ, CONTEXT, K, ROUNDS = 32, 10, 2, 25, 4

VARIANTS = [
    # (tag, grad_accum, unroll)
    ("baseline (unsplit b32)", 1, False),
    ("grad_accum=2 scan (sequential b16+b16)", 2, False),
    ("grad_accum=2 unrolled (interleaved b16||b16)", 2, True),
]


def bench(tag: str, grad_accum: int, unroll: bool) -> float:
    cfg = ModelConfig(model_type="CDNA", num_masks=10,
                      sequence_length=SEQ, context_frames=CONTEXT,
                      scheduled_sampling_k=900.0,
                      compute_dtype="bfloat16", use_pallas=True,
                      scan_unroll=SEQ - 1, lstm_gate_compute="compute")
    opt = ts_lib.make_optimizer(1e-3)
    state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    multi = ts_lib.make_train_multi(cfg, opt, mesh=None,
                                    grad_accum=grad_accum,
                                    grad_accum_unroll=unroll)

    imgs, acts, stas = synthetic.generate_sequences(BATCH * K, SEQ, 64, 64)

    def stack(x):
        return np.ascontiguousarray(
            x.reshape(K, BATCH, *x.shape[1:]).swapaxes(1, 2))

    batches = jax.tree_util.tree_map(
        jnp.asarray, tuple(stack(a) for a in (imgs, acts, stas)))

    state, m = multi(state, batches, jnp.float32(0.0), jax.random.PRNGKey(1))
    float(np.asarray(m["loss"])[-1])
    t0 = time.perf_counter()
    for r in range(ROUNDS):
        state, m = multi(state, batches, jnp.float32((r + 1) * K),
                         jax.random.PRNGKey(1))
    final_loss = float(np.asarray(m["loss"])[-1])
    dt = time.perf_counter() - t0

    ms = 1000.0 * dt / (ROUNDS * K)
    print(json.dumps({
        "metric": f"b32 interleave experiment: {tag}",
        "value": round(ms, 2),
        "unit": "ms/step",
        "steps_per_sec": round(1000.0 / ms, 2),
        "final_loss": final_loss,
    }), flush=True)
    return ms


if __name__ == "__main__":
    results = {tag: bench(tag, ga, un) for tag, ga, un in VARIANTS}
    base = results[VARIANTS[0][0]]
    inter = results[VARIANTS[2][0]]
    print(json.dumps({
        "metric": "interleave vs baseline step-time ratio",
        "value": round(inter / base, 4),
        "unit": "x (accept < 0.95)",
    }), flush=True)
