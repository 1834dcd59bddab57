"""Serving-batch scaling benchmark THROUGH the export artifact.

bench_inference.py measures the in-process jitted rollout;
this measures what a production server actually runs: the serialized
StableHLO artifact (pivp_tpu.inference.export), loaded with
load_serving_artifact, swept across serving batch sizes, with an MFU
column so the serving story is quantified the same way the training one
is (analytic conv FLOPs, utils/flops.py — forward-only, (T-1) timesteps
per rollout).

The reference's only serving path is re-running predict_model.py for one
sequence (/root/reference/src/models/predict_model.py) — there is no
batched or compiled-artifact counterpart to compare against, so the
table stands as this framework's own serving baseline.

Two rates per batch point:
  * on-device — jit-composed digest around the artifact call (host
    fetches 8 bytes; no frame download in the timed region);
  * e2e — includes downloading the uint8 predicted frames the artifact
    returns (what a co-located server would ship per reply).

Run: python tools/bench_serving.py [--batches 32,64,128,256,512]
     [--rounds 8] [--model_type CDNA]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from pivp_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pivp_tpu.config import ModelConfig  # noqa: E402
from pivp_tpu.inference import export as export_lib  # noqa: E402
from pivp_tpu.models import predictor  # noqa: E402
from pivp_tpu.utils import flops as flops_lib  # noqa: E402

SEQ, CONTEXT = 10, 2
NUM_MASKS = flops_lib.DEFAULT_NUM_MASKS


def bench_batch(model_type: str, batch: int, rounds: int) -> dict:
    cfg = ModelConfig(model_type=model_type,
                      num_masks=NUM_MASKS[model_type],
                      sequence_length=SEQ, context_frames=CONTEXT,
                      scheduled_sampling_k=-1.0,
                      compute_dtype="bfloat16",
                      use_pallas=jax.default_backend() == "tpu",
                      scan_unroll=SEQ - 1,
                      lstm_gate_compute="compute")
    params = predictor.init_params(jax.random.PRNGKey(0), cfg)

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, f"{model_type}_b{batch}.jaxexport")
        export_lib.export_serving_artifact(params, cfg, batch, path)
        artifact_bytes = os.path.getsize(path)
        call = export_lib.load_serving_artifact(path)

    rng = np.random.default_rng(0)
    images = rng.random((CONTEXT, batch, cfg.image_height,
                         cfg.image_width, cfg.color_channels),
                        dtype=np.float32)
    actions = rng.random((SEQ - 1, batch, cfg.action_dim),
                         dtype=np.float32)
    state0 = rng.random((batch, cfg.state_dim), dtype=np.float32)
    images, actions, state0 = jax.device_put((images, actions, state0))

    # On-device rate: compose the artifact call with an on-device digest
    # so the timed region never downloads frames (exported.call is
    # traceable, so XLA fuses the reduction into the same program).
    @jax.jit
    def digest(images, actions, state0, salt):
        frames = call(images + salt, actions, state0)
        return jnp.mean(frames.astype(jnp.float32))

    frames_per_call = batch * (SEQ - CONTEXT)
    float(digest(images, actions, state0, jnp.float32(0.0)))  # warmup
    times = []
    for r in range(rounds):
        t0 = time.perf_counter()
        float(digest(images, actions, state0, jnp.float32(r) * 1e-6))
        times.append(time.perf_counter() - t0)
    med = float(np.median(times))
    device_fps = frames_per_call / med

    # e2e: download the uint8 frames the artifact returns.
    out = np.asarray(call(images, actions, state0))       # warmup
    assert out.dtype == np.uint8 and out.shape[0] == SEQ - CONTEXT
    e2e_times = []
    for _ in range(max(2, rounds // 2)):
        t0 = time.perf_counter()
        np.asarray(call(images, actions, state0))
        e2e_times.append(time.perf_counter() - t0)
    e2e_fps = frames_per_call / float(np.median(e2e_times))

    # Forward-only FLOPs: the rollout runs T-1 trunk+head steps per
    # sequence regardless of how many frames are "predicted" outputs.
    rollout_flops = flops_lib.forward_step_flops(cfg) * (SEQ - 1) * batch
    achieved_tflops = rollout_flops / med / 1e12

    row = {
        "metric": f"{model_type} b{batch} serving (export artifact)",
        "value": round(device_fps, 1),
        "unit": "predicted frames/s/chip",
        "ms_per_rollout": round(1000.0 * med, 2),
        "ms_per_rollout_min": round(1000.0 * min(times), 2),
        "ms_per_rollout_max": round(1000.0 * max(times), 2),
        "achieved_tflops": round(achieved_tflops, 1),
        "mfu_vs_v5e_bf16_peak": round(flops_lib.mfu(achieved_tflops), 3),
        "e2e_frames_per_sec": round(e2e_fps, 1),
        "batch": batch,
        "artifact_bytes": artifact_bytes,
    }
    print(json.dumps(row), flush=True)
    return row


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=str, default="32,64,128,256,512")
    ap.add_argument("--rounds", type=int, default=8)
    ap.add_argument("--model_type", type=str, default="CDNA")
    a = ap.parse_args()
    for b in (int(x) for x in a.batches.split(",")):
        bench_batch(a.model_type, b, a.rounds)
