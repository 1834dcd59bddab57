"""Inference (serving) throughput benchmark: autoregressive feed-self
rollout of each head, batched, on one chip.

The reference has no serving path beyond single-sequence predict
(/root/reference/src/models/predict_model.py); this measures the
TPU-native equivalent of a production prediction service: jitted
train=False rollout (context frames in, T-context predicted frames out),
dispatched asynchronously so the tunnel RTT overlaps compute.

Two numbers per config:
  * rollout  — on-device prediction rate (host fetches an 8-byte digest
    per dispatch, so the device pipeline never stalls on the tunnel);
  * e2e      — end-to-end including download of the predicted frames,
    quantized to uint8 on-device first (4x less tunnel traffic, the
    same trick as TrainConfig.u8_transfer on the input side).

Run: python tools/bench_inference.py [--batch 32] [--rounds 16]
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
from pivp_tpu.data import dataset as dataset_lib  # noqa: E402
from pivp_tpu.data import synthetic  # noqa: E402
from pivp_tpu.models import predictor  # noqa: E402
from pivp_tpu.ops import transforms  # noqa: E402
from pivp_tpu.utils import flops as flops_lib  # noqa: E402

SEQ, CONTEXT = 10, 2

MODELS = list(flops_lib.DEFAULT_NUM_MASKS.items())


def bench_model(model_type: str, num_masks: int, batch: int,
                rounds: int) -> None:
    cfg = ModelConfig(model_type=model_type, num_masks=num_masks,
                      sequence_length=SEQ, context_frames=CONTEXT,
                      scheduled_sampling_k=-1.0,
                      compute_dtype="bfloat16", use_pallas=True,
                      scan_unroll=SEQ - 1,
                      lstm_gate_compute="compute")
    params = predictor.init_params(jax.random.PRNGKey(0), cfg)
    imgs, acts, stas = synthetic.generate_sequences(batch, SEQ)
    images, actions, states = (
        jnp.asarray(a) for a in dataset_lib.to_time_major(
            imgs, acts, stas))

    @jax.jit
    def predict_digest(params, images, actions, states, salt):
        out = predictor.rollout(
            params, cfg, images + salt, actions, states,
            jnp.float32(0.0), jax.random.PRNGKey(0), train=False)
        return jnp.mean(out["gen_images"].astype(jnp.float32))

    @jax.jit
    def predict_digest_multi(params, images, actions, states, salts):
        # K rollouts per device dispatch (lax.scan over salts): removes
        # per-dispatch launch overhead entirely — the pure device rate.
        def body(_, salt):
            return 0, predict_digest(params, images, actions, states,
                                     salt)
        _, digests = jax.lax.scan(body, 0, salts)
        return digests

    @jax.jit
    def predict_frames(params, images, actions, states, salt):
        out = predictor.rollout(
            params, cfg, images + salt, actions, states,
            jnp.float32(0.0), jax.random.PRNGKey(0), train=False)
        # gen_images: (T-1, B, H, W, C); the predicted frames are the
        # last T-context entries (rollout convention, predictor.py:307).
        gen = out["gen_images"][CONTEXT - 1:]
        return transforms.quantize_frames_u8(gen)

    frames_per_call = batch * (SEQ - CONTEXT)

    # --- on-device rollout rate (K rollouts per dispatch) ---------------
    salts = jnp.arange(rounds, dtype=jnp.float32) * 1e-6
    np.asarray(predict_digest_multi(params, images, actions, states,
                                    salts))          # compile + warmup
    t0 = time.perf_counter()
    d1 = predict_digest_multi(params, images, actions, states,
                              salts + 1e-3)
    d2 = predict_digest_multi(params, images, actions, states,
                              salts + 2e-3)
    _ = np.asarray(d1), np.asarray(d2)
    dt = time.perf_counter() - t0
    rollout_fps = 2 * rounds * frames_per_call / dt

    # --- async per-dispatch rate (one rollout per device call) ----------
    float(predict_digest(params, images, actions, states,
                         jnp.float32(0.0)))          # compile + warmup
    t0 = time.perf_counter()
    outs = [predict_digest(params, images, actions, states,
                           jnp.float32(r) * 1e-6) for r in range(rounds)]
    _ = [float(o) for o in outs]
    dt = time.perf_counter() - t0
    dispatch_fps = rounds * frames_per_call / dt

    # --- end-to-end including uint8 frame download ----------------------
    np.asarray(predict_frames(params, images, actions, states,
                              jnp.float32(0.0)))     # compile + warmup
    t0 = time.perf_counter()
    outs = [predict_frames(params, images, actions, states,
                           jnp.float32(r) * 1e-6) for r in range(rounds)]
    last = [np.asarray(o) for o in outs][-1]
    dt = time.perf_counter() - t0
    e2e_fps = rounds * frames_per_call / dt
    assert last.dtype == np.uint8 and last.shape[-1] == 3

    print(json.dumps({
        "metric": f"{model_type} b{batch} inference rollout",
        "value": round(rollout_fps, 1),
        "unit": "predicted frames/s/chip",
        "per_dispatch_frames_per_sec": round(dispatch_fps, 1),
        "e2e_frames_per_sec": round(e2e_fps, 1),
        "ms_per_rollout": round(1000.0 * batch * (SEQ - CONTEXT)
                                / rollout_fps, 2),
        "batch": batch,
    }), flush=True)


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--rounds", type=int, default=16)
    a = ap.parse_args()
    for model_type, num_masks in MODELS:
        bench_model(model_type, num_masks, a.batch, a.rounds)
