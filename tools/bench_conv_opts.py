"""Round-5 conv-floor experiments (VERDICT r4 #1): measure the two
small-input-channel conv attacks at the exact bench.py config.

Per-shape attribution (tools/conv_shape_attribution.py, b32) showed the
sub-50%-MFU conv time concentrated in (a) gate convs with cin < 128
(lstm1/2 at cin=64: 42% MFU, lstm3 at cin=96: 48%) and (b) the enc0
trio around the 3-channel image (2-6% MFU, overhead-bound). The two
flags attack exactly these:

  * pad_gate_convs  — forward-only zero-padding of gate-conv cin to 128
    (custom_vjp; layers._conv_cin_padded)
  * enc0_space_to_depth — enc0 as a stride-1 3x3 conv over 2x2
    space-to-depth blocks (layers.conv2d_s2d)

Accept at >=2% step-time win each (they compose); numbers land in
BENCHMARKS.md either way.

Run on TPU: python tools/bench_conv_opts.py
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

BATCH = int(os.environ.get("BENCH_BATCH", "32"))
SEQ, CONTEXT, K, ROUNDS = 10, 2, 25, 4

# every flag pinned explicitly so results don't shift with config
# defaults ("baseline" is the pre-round-5 program)
_OFF = {"pad_gate_convs": False, "enc0_space_to_depth": False,
        "one_by_one_matmul": False}
ALL_VARIANTS = {
    "baseline": {**_OFF},
    "pad_gate_convs": {**_OFF, "pad_gate_convs": True},
    "enc0_space_to_depth": {**_OFF, "enc0_space_to_depth": True},
    "one_by_one_matmul": {**_OFF, "one_by_one_matmul": True},
    "pad+1x1": {**_OFF, "pad_gate_convs": True, "one_by_one_matmul": True},
    "1x1-bwd": {**_OFF, "one_by_one_matmul": "bwd"},
    "pad+1x1-bwd": {**_OFF, "pad_gate_convs": True,
                    "one_by_one_matmul": "bwd"},
    "all": {"pad_gate_convs": True, "enc0_space_to_depth": True,
            "one_by_one_matmul": True},
}
VARIANTS = [(t, ALL_VARIANTS[t]) for t in (
    sys.argv[1:] or ["baseline", "pad_gate_convs", "enc0_space_to_depth",
                     "one_by_one_matmul", "pad+1x1"])]


def bench(tag: str, overrides: dict) -> float:
    cfg = ModelConfig(model_type="CDNA", num_masks=10,
                      sequence_length=SEQ, context_frames=CONTEXT,
                      scheduled_sampling_k=900.0,
                      compute_dtype="bfloat16", use_pallas=True,
                      scan_unroll=SEQ - 1, lstm_gate_compute="compute",
                      **overrides)
    opt = ts_lib.make_optimizer(1e-3)
    state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    multi = ts_lib.make_train_multi(cfg, opt, mesh=None)

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
    print(json.dumps({"variant": tag, "ms_per_step": round(ms, 2),
                      "frames_per_s": round(BATCH * (SEQ - CONTEXT)
                                            / (ms / 1e3), 0),
                      "final_loss": round(final_loss, 6)}), flush=True)
    return ms


def main() -> None:
    results = {tag: bench(tag, ov) for tag, ov in VARIANTS}
    base_tag = next(iter(results))
    base = results[base_tag]
    for tag, ms in results.items():
        if tag != base_tag:
            print(f"{tag}: {ms / base:.3f}x {base_tag}")


if __name__ == "__main__":
    main()
