"""Benchmark: training-step throughput of the flagship CDNA model on the
reference benchmark config (batch 32, T=10 64x64 frames, context 2,
scheduled sampling k=900 — /root/reference/src/models/train_model.py:779-787
defaults).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Methodology: K optimizer steps per device dispatch (make_train_multi) so
host/tunnel latency doesn't pollute the number; timed after a full
compile+warmup dispatch; final block_until_ready.

vs_baseline compares against a single-process CPU training step of the
same model (tools/measure_cpu_baseline.py on this machine). The reference
is a single-device Chainer program whose CPU path executes op-by-op; the
XLA-CPU baseline is strictly faster than that, so the reported ratio is a
conservative lower bound on the vs-reference speedup. North-star target:
>=10x (BASELINE.json).
"""

from __future__ import annotations

import json
import time

import numpy as np

# XLA-CPU single-device baseline, measured with
# tools/measure_cpu_baseline.py on this host (2026-08-16): 0.0061 steps/s
# at batch 4 = 0.20 predicted frames/s. NOTE this host has ONE CPU core;
# on a many-core workstation the CPU baseline would scale roughly with
# core count, so divide the reported ratio accordingly when comparing
# against beefier hosts.
CPU_BASELINE_FRAMES_PER_SEC = 0.20

BATCH = 32
SEQ = 10
CONTEXT = 2
K = 25            # optimizer steps per dispatch
ROUNDS = 5        # timed dispatches; per-dispatch times -> median + spread


def main() -> None:
    from pivp_tpu.utils import compile_cache

    compile_cache.enable()

    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from pivp_tpu.config import ModelConfig
    from pivp_tpu.data import synthetic
    from pivp_tpu.parallel import mesh as mesh_lib
    from pivp_tpu.parallel import train_step as ts_lib

    # Fastest honest training config — reproducible from public CLI flags:
    #   train_cli --compute_dtype bfloat16 --use_pallas 1 --scan_unroll 9
    #             --steps_per_call 25
    # (pad_gate_convs defaults to "auto" and engages at b32 — round 5.)
    # Measured A/B ladder on TPU v5e (2026-08-16, host-fetch barriers):
    # f32 XLA 111.6 ms/step -> bf16+pallas 81.1 (round 1) -> +remat 63.2
    # -> +full scan unroll (remat off) 43.7. The full unroll removes the
    # lax.scan while-loop, so the backward pass reads forward activations
    # as SSA values instead of stacked dynamic-update-slice buffers —
    # the trace showed that stacking cost 22.6 ms/step, as much as every
    # convolution combined (see BENCHMARKS.md "Trace attribution").
    cfg = ModelConfig(model_type="CDNA", num_masks=10,
                      sequence_length=SEQ, context_frames=CONTEXT,
                      scheduled_sampling_k=900.0,
                      compute_dtype="bfloat16", use_pallas=True,
                      scan_unroll=SEQ - 1,
                      # bf16 gate math: -8.6% step time, losses to 3 sig
                      # figs (the 'auto' TPU default; see BENCHMARKS.md)
                      lstm_gate_compute="compute")
    mesh = mesh_lib.make_mesh()
    opt = ts_lib.make_optimizer(1e-3)
    state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    multi = ts_lib.make_train_multi(cfg, opt, mesh)

    # K distinct synthetic batches, staged on device once.
    imgs, acts, stas = synthetic.generate_sequences(BATCH * K, SEQ)
    def stack(x):
        return x.reshape(K, BATCH, *x.shape[1:]).swapaxes(1, 2)
    batches = tuple(
        np.ascontiguousarray(stack(a)) for a in (imgs, acts, stas))
    if mesh.size > 1:
        bsh = NamedSharding(mesh, P(None, None, mesh_lib.DATA_AXIS))
        batches = jax.device_put(batches, bsh)
    else:
        batches = jax.device_put(batches)

    rng = jax.random.PRNGKey(1)
    # Warmup / compile. NOTE: the timing barrier is a real host fetch of
    # the final loss — on remote-attached runtimes block_until_ready can
    # return before execution finishes, silently timing only dispatch.
    state, metrics = multi(state, batches, jnp.float32(0.0), rng)
    float(metrics["loss"][-1])

    # Each dispatch is timed individually, with the same host-fetch
    # barrier as the warmup, so the JSON can carry median + spread
    # rather than a single aggregate. The fetch is ONE scalar (the last
    # step's loss, sliced on device), not the full K-step array — the
    # barrier round-trip is methodology (block_until_ready is unreliable
    # through the tunnel), but the payload shouldn't scale with K. Each
    # ms_per_step therefore includes 1/K of one host RTT by design.
    times = []
    final_loss = 0.0
    for r in range(ROUNDS):
        t0 = time.perf_counter()
        state, metrics = multi(state, batches,
                               jnp.float32((r + 1) * K), rng)
        final_loss = float(metrics["loss"][-1])
        times.append(time.perf_counter() - t0)

    med = float(np.median(times))
    steps_per_sec = K / med
    # Predicted frames per optimizer step (8 per sequence at reference
    # defaults), matching BASELINE.json's "10-step rollout frames/sec".
    frames_per_sec = steps_per_sec * BATCH * (SEQ - CONTEXT)
    n_chips = len(jax.devices())

    from pivp_tpu.utils import flops as flops_lib

    step_flops = flops_lib.train_step_flops(cfg, BATCH)
    achieved_tflops = step_flops * steps_per_sec / n_chips / 1e12

    result = {
        "metric": "CDNA b32 T10 64x64 train throughput "
                  "(predicted frames/s/chip)",
        "value": round(frames_per_sec / n_chips, 2),
        "unit": "frames/s/chip",
        # NOTE: the CPU baseline below is a 1-core XLA-CPU host; the
        # meaningful headline numbers are ms_per_step / frames/s/chip /
        # achieved_tflops (hand-counted conv FLOPs, utils/flops.py —
        # XLA cost_analysis under-reports convs on this backend).
        "vs_baseline": round(
            (frames_per_sec / n_chips) / CPU_BASELINE_FRAMES_PER_SEC, 2),
        "steps_per_sec": round(steps_per_sec, 3),
        "ms_per_step": round(1000.0 / steps_per_sec, 2),
        # Per-dispatch spread over ROUNDS timed dispatches (K steps each,
        # host-fetch barrier per dispatch). ms_per_step is the median.
        "ms_per_step_min": round(1000.0 * min(times) / K, 2),
        "ms_per_step_max": round(1000.0 * max(times) / K, 2),
        "timed_dispatches": ROUNDS,
        "achieved_tflops_per_chip": round(achieved_tflops, 1),
        "mfu_vs_v5e_bf16_peak": round(flops_lib.mfu(achieved_tflops), 3),
        "devices": n_chips,
        "final_loss": final_loss,
        # Real-TPU numerical regression of BOTH Pallas kernels (local
        # kernel apply at 64x64 whole-frame + 256x256 H-tiled; fused
        # ConvLSTM gates at C in {32,64,128}; f32 + bf16) — the compiled
        # paths the CPU test suite can only interpret.
        "pallas_tpu_check": _pallas_check(),
    }
    print(json.dumps(result))


def _pallas_check() -> str:
    import os
    import subprocess
    import sys

    tool = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "tools", "check_pallas_tpu.py")
    try:
        proc = subprocess.run([sys.executable, tool], capture_output=True,
                              text=True, timeout=1800)
    except Exception as e:  # never let the check sink the bench number
        return f"error({e})"
    if proc.returncode == 0:
        return "ok"
    tail = (proc.stdout + proc.stderr).strip().splitlines()[-1:]
    return f"fail(rc={proc.returncode}: {' '.join(tail)[:200]})"


if __name__ == "__main__":
    main()
