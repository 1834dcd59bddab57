"""Long-rollout (T=30) training benchmark: full unroll vs rolled scan vs
rolled scan + per-step remat.

The reference caps at T=10 in practice (its Python-loop graph grows
linearly with T and the define-by-run backward stores every
intermediate). This measures the three TPU time-axis strategies at 3x
that length — the regime where the full-unroll default stops being
automatic and remat's FLOPs-for-HBM trade starts paying.

Run: python tools/bench_long_rollout.py [--seq 30] [--batch 32]
"""

from __future__ import annotations

import argparse
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
from pivp_tpu.utils import flops as flops_lib  # noqa: E402

K, ROUNDS = 10, 2


def bench(tag: str, seq: int, batch: int, unroll: int, remat: bool
          ) -> None:
    cfg = ModelConfig(model_type="CDNA", num_masks=10,
                      sequence_length=seq, context_frames=2,
                      scheduled_sampling_k=900.0,
                      compute_dtype="bfloat16", use_pallas=True,
                      scan_unroll=unroll,
                      lstm_gate_compute="compute")
    opt = ts_lib.make_optimizer(1e-3)
    state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    multi = ts_lib.make_train_multi(cfg, opt, mesh=None, remat=remat)

    imgs, acts, stas = synthetic.generate_sequences(batch * K, seq)

    def stack(x):
        return np.ascontiguousarray(
            x.reshape(K, batch, *x.shape[1:]).swapaxes(1, 2))

    batches = jax.tree_util.tree_map(
        jnp.asarray, tuple(stack(a) for a in (imgs, acts, stas)))

    t_c = time.perf_counter()
    try:
        state, m = multi(state, batches, jnp.float32(0.0),
                         jax.random.PRNGKey(1))
        float(np.asarray(m["loss"])[-1])
    except Exception as e:
        msg = str(e)
        oom = "RESOURCE_EXHAUSTED" in msg or "memory" in msg.lower()
        print(json.dumps({
            "metric": f"CDNA b{batch} T{seq} {tag}",
            "value": None, "unit": "frames/s/chip",
            "oom": oom,
            "error": msg.splitlines()[0][:200],
        }), flush=True)
        return
    compile_s = time.perf_counter() - t_c

    t0 = time.perf_counter()
    for r in range(ROUNDS):
        state, m = multi(state, batches, jnp.float32((r + 1) * K),
                         jax.random.PRNGKey(1))
    final_loss = float(np.asarray(m["loss"])[-1])
    dt = time.perf_counter() - t0

    sps = ROUNDS * K / dt
    fps = sps * batch * (seq - 2)
    step_flops = flops_lib.train_step_flops(cfg, batch, remat=remat)
    print(json.dumps({
        "metric": f"CDNA b{batch} T{seq} {tag}",
        "value": round(fps, 1),
        "unit": "frames/s/chip",
        "ms_per_step": round(1000 / sps, 2),
        "achieved_tflops": round(step_flops * sps / 1e12, 1),
        "compile_plus_warmup_s": round(compile_s, 1),
        "final_loss": final_loss,
    }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--seq", type=int, default=30)
    ap.add_argument("--batch", type=int, default=32)
    a = ap.parse_args()
    bench("rolled scan", a.seq, a.batch, unroll=1, remat=False)
    bench("rolled + remat", a.seq, a.batch, unroll=1, remat=True)
    bench("full unroll", a.seq, a.batch, unroll=a.seq - 1, remat=False)
