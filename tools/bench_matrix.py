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

# Batch / resolution scaling beyond the reference config (--scaling):
# (tag, batch, H, W, remat, K_override). 256x256 exercises the H-tiled
# Pallas local-apply path in a full training step; remat keeps the
# unrolled 16x-pixel activations inside HBM.
SCALING_CONFIGS = [
    ("CDNA b64 64x64", 64, 64, 64, False, None),
    ("CDNA b128 64x64", 128, 64, 64, False, None),
    ("CDNA b4 256x256 (H-tiled Pallas)", 4, 256, 256, False, 4),
]


def bench_config(tag, model_type, num_masks, batch, k_sched,
                 height=64, width=64, remat=False, k_steps=None,
                 literal=False, **cfg_overrides):
    k_steps = k_steps or K
    cfg = ModelConfig(model_type=model_type, num_masks=num_masks,
                      sequence_length=SEQ, context_frames=CONTEXT,
                      scheduled_sampling_k=k_sched,
                      image_height=height, image_width=width,
                      compute_dtype="bfloat16",
                      use_pallas=model_type != "STP",
                      scan_unroll=0 if remat else SEQ - 1,
                      lstm_gate_compute="compute",
                      **cfg_overrides)
    if literal:
        from pivp_tpu import config as config_mod
        cfg = config_mod.as_reference_literal(cfg)
    opt = ts_lib.make_optimizer(1e-3)
    state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    multi = ts_lib.make_train_multi(cfg, opt, mesh=None, remat=remat)

    imgs, acts, stas = synthetic.generate_sequences(
        batch * k_steps, SEQ, height, width)

    def stack(x):
        return np.ascontiguousarray(
            x.reshape(k_steps, batch, *x.shape[1:]).swapaxes(1, 2))

    batches = jax.tree_util.tree_map(
        jnp.asarray, tuple(stack(a) for a in (imgs, acts, stas)))

    state, m = multi(state, batches, jnp.float32(0.0),
                     jax.random.PRNGKey(1))
    float(np.asarray(m["loss"])[-1])
    t0 = time.perf_counter()
    for r in range(ROUNDS):
        state, m = multi(state, batches, jnp.float32((r + 1) * k_steps),
                         jax.random.PRNGKey(1))
    final_loss = float(np.asarray(m["loss"])[-1])
    dt = time.perf_counter() - t0

    sps = ROUNDS * k_steps / dt
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
    if "--scaling" in sys.argv:
        for tag, b, h, w, remat, ko in SCALING_CONFIGS:
            bench_config(tag, "CDNA", 10, b, 900.0, height=h, width=w,
                         remat=remat, k_steps=ko)
    elif "--stp_per_mask" in sys.argv:
        # The non-quirk STP branch (original-TF distinct Linear(6) per
        # mask): num_masks-1 genuinely different warps instead of the
        # shared-warp broadcast — the measured cost of flipping
        # stp_shared_params (config.py documents the default asymmetry
        # with this number).
        bench_config("STP b32 per-mask params", "STP", 10, 32, 900.0,
                     stp_shared_params=False)
    elif "--literal" in sys.argv:
        # Reference-LITERAL semantics (--reference_literal): detached
        # scheduled sampling truncates backprop-through-time at each
        # generated frame — a semantics choice, benched so the
        # literal-parity mode has its own throughput number.
        bench_config("CDNA b32 reference-literal semantics", "CDNA", 10,
                     32, 900.0, literal=True)
    else:
        for spec in CONFIGS:
            bench_config(*spec)
