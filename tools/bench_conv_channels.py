"""Measure whether channel-packing the trunk's small-channel convs could
pay on TPU (VERDICT round-2 suggestion: "channel-packing the 32-ch
stages (pad to 64/128 lanes) for the conv fusions").

The hypothesis to test: convs with 32 output channels waste MXU lanes
(v5e tiles the output-channel dim at 128), so computing 64 or 128
channels should cost the SAME wall time as 32 — in which case packing
two 32-ch stages into one 64-ch conv cannot reduce MXU time, only
(maybe) fusion count; while padding a single stage 32->64 strictly adds
work. This probe times the model's actual conv shapes (B=32, the bench
config) at output-channel counts {3, 8, 32, 64, 128} with a host-fetch
barrier, forward and forward+backward.

Run on TPU: python tools/bench_conv_channels.py
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

from pivp_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

B = 32
REPS = 50   # conv applications per timed dispatch (scan)

# (tag, H, W, C_in, kh, stride) — the trunk stages whose small channel
# counts the round-3 floor trace blamed (BENCHMARKS.md "Round 3").
SHAPES = [
    ("enc0-like 64x64 cin3 5x5 s2", 64, 64, 3, 5, 2),
    ("enc1-like 32x32 cin32 3x3 s2", 32, 32, 32, 3, 2),
    ("lstm1-like 32x32 cin64 5x5 s1", 32, 32, 64, 5, 1),
    ("enc7-like 64x64 cin64 1x1 s1", 64, 64, 64, 1, 1),
]

COUTS = [3, 8, 32, 64, 128]


def time_conv(h, w, cin, kh, stride, cout, backward):
    x = jnp.asarray(np.random.RandomState(0).rand(B, h, w, cin),
                    jnp.bfloat16)
    k = jnp.asarray(np.random.RandomState(1).rand(kh, kh, cin, cout) * .1,
                    jnp.bfloat16)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    if backward:
        def one(k):
            def loss(k):
                return jnp.sum(conv(x, k).astype(jnp.float32))
            return jax.grad(loss)(k)

        def body(c, _):
            g = one(c)
            return (c + 0e0 * g).astype(k.dtype), jnp.sum(
                g.astype(jnp.float32))
    else:
        def body(c, _):
            y = conv(x, c)
            # Fold the output back into the carry so REPS convs chain
            # (prevents XLA from collapsing the scan to one conv).
            upd = jnp.sum(y.astype(jnp.float32)) * 0e0
            return (c + upd).astype(k.dtype), upd

    @jax.jit
    def run(k):
        c, outs = jax.lax.scan(body, k, None, length=REPS)
        return jnp.sum(outs) + jnp.sum(c.astype(jnp.float32))

    float(run(k))          # compile + warmup, host-fetch barrier
    t0 = time.perf_counter()
    n = 3
    for _ in range(n):
        float(run(k))
    dt = (time.perf_counter() - t0) / (n * REPS)
    return dt * 1e6        # us per conv application


def main():
    for tag, h, w, cin, kh, stride in SHAPES:
        for backward in (False, True):
            row = {"shape": tag, "pass": "fwd+bwd" if backward else "fwd"}
            for cout in COUTS:
                row[f"cout{cout}_us"] = round(
                    time_conv(h, w, cin, kh, stride, cout, backward), 2)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
