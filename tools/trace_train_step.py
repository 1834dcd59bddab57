"""Capture ONE traced K-step train dispatch at a given batch size and
print the per-HLO-op device-time attribution.

The workhorse behind BENCHMARKS.md's floor analyses: runs the exact
bench.py config (CDNA bf16 + Pallas + full unroll + bf16 gates,
make_train_multi, K steps/dispatch) at --batch N, traces the second
dispatch, and prints (a) the category totals and (b) the top ops with
their HLO names — conv shapes are readable from the fusion names.

Run on TPU:
  python tools/trace_train_step.py --batch 32 --top 30
  python tools/trace_train_step.py --batch 64 --top 30   # b64 anomaly
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pivp_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from pivp_tpu.config import ModelConfig  # noqa: E402
from pivp_tpu.data import synthetic  # noqa: E402
from pivp_tpu.parallel import mesh as mesh_lib  # noqa: E402
from pivp_tpu.parallel import train_step as ts_lib  # noqa: E402
from tools import trace_top_ops  # noqa: E402

SEQ, CONTEXT, K = 10, 2, 25


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--keep", default="",
                    help="keep the raw trace under this dir")
    ap.add_argument("--merge_output_convs", type=int, default=1)
    a = ap.parse_args()

    cfg = ModelConfig(model_type="CDNA", num_masks=10,
                      sequence_length=SEQ, context_frames=CONTEXT,
                      scheduled_sampling_k=900.0,
                      compute_dtype="bfloat16", use_pallas=True,
                      scan_unroll=SEQ - 1,
                      lstm_gate_compute="compute",
                      merge_output_convs=bool(a.merge_output_convs))
    mesh = mesh_lib.make_mesh(devices=jax.devices()[:1])
    opt = ts_lib.make_optimizer(1e-3)
    state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    multi = ts_lib.make_train_multi(cfg, opt, mesh)

    imgs, acts, stas = synthetic.generate_sequences(a.batch * K, SEQ)

    def stack(x):
        return x.reshape(K, a.batch, *x.shape[1:]).swapaxes(1, 2)

    batches = jax.device_put(tuple(
        np.ascontiguousarray(stack(x)) for x in (imgs, acts, stas)))

    rng = jax.random.PRNGKey(1)
    state, metrics = multi(state, batches, jnp.float32(0.0), rng)
    float(metrics["loss"][-1])                 # compile + warmup barrier

    tdir = a.keep or tempfile.mkdtemp(prefix=f"trace-b{a.batch}-")
    with jax.profiler.trace(tdir):
        state, metrics = multi(state, batches, jnp.float32(K), rng)
        float(metrics["loss"][-1])

    xs = trace_top_ops.load_xspace(trace_top_ops.find_xplane(tdir))
    totals, cats, span = trace_top_ops.device_op_totals(xs)

    def ms_step(ps: int) -> float:
        return ps / 1e9 / K

    print(json.dumps({
        "batch": a.batch, "k": K,
        "device_op_ms_per_step": round(ms_step(span), 3),
        "categories_ms_per_step": {
            c: round(ms_step(p), 3)
            for c, p in sorted(cats.items(), key=lambda kv: -kv[1])},
    }))
    print(f"\nTop {a.top} ops (ms per optimizer step):")
    for name, ps in sorted(totals.items(), key=lambda kv: -kv[1])[:a.top]:
        print(f"  {ms_step(ps):8.3f}  {name[:110]}")
    if not a.keep:
        shutil.rmtree(tdir, ignore_errors=True)


if __name__ == "__main__":
    main()
