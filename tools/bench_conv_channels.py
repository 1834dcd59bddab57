"""Measure whether channel-packing the trunk's small-channel convs could
pay on TPU (VERDICT round-2 suggestion: "channel-packing the 32-ch
stages (pad to 64/128 lanes) for the conv fusions").

The hypothesis to test: convs with 32 output channels waste MXU lanes
(v5e tiles the output-channel dim at 128), so computing 64 or 128
channels should cost the SAME wall time as 32 — in which case packing
two 32-ch stages into one 64-ch conv cannot reduce MXU time, only
(maybe) fusion count; while padding a single stage 32->64 strictly adds
work. This probe times the model's actual conv shapes (B=32, the bench
config) at output-channel counts {3, 32, 64, 128}, forward and
forward+backward.

Measurement is DEVICE-SIDE: each config's scan runs once under a
jax.profiler trace and the per-conv time is the summed device op time
from the xplane divided by the scan length. Host-side wall timing is
useless on a remote-attached chip — the tunnel RTT jitter (tens of ms)
exceeds the total measured compute even with two-point subtraction.

Run on TPU: python tools/bench_conv_channels.py
"""

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

from tools import trace_top_ops  # noqa: E402

B = 32
REPS = 512   # conv applications in the one traced dispatch

# (tag, H, W, C_in, kh, stride) — the trunk stages whose small channel
# counts the round-3 floor trace blamed (BENCHMARKS.md "Round 3").
SHAPES = [
    ("enc0-like 64x64 cin3 5x5 s2", 64, 64, 3, 5, 2),
    ("enc1-like 32x32 cin32 3x3 s2", 32, 32, 32, 3, 2),
    ("lstm1-like 32x32 cin64 5x5 s1", 32, 32, 64, 5, 1),
    ("enc7-like 64x64 cin64 1x1 s1", 64, 64, 64, 1, 1),
]

COUTS = [3, 32, 64, 128]


def time_conv(h, w, cin, kh, stride, cout, backward):
    x = jnp.asarray(np.random.RandomState(0).rand(B, h, w, cin),
                    jnp.bfloat16)
    k = jnp.asarray(np.random.RandomState(1).rand(kh, kh, cin, cout) * .1,
                    jnp.bfloat16)

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (stride, stride), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))

    # The carry must GENUINELY evolve with each iteration's result — a
    # `* 0.0` feedback gets constant-folded, leaving the loop body
    # invariant, and XLA's while-loop LICM then hoists the whole conv
    # (or grad) out of the scan, timing nothing. A tiny but nonzero
    # scalar feedback (~1e-6 drift on 0.1-scale weights) defeats both
    # folding and hoisting while leaving the conv shapes unchanged.
    # The backward loss must be NONLINEAR in the kernel (squared), or
    # its gradient is kernel-independent and LICM hoists it; grads are
    # taken w.r.t. BOTH kernel and input so the body contains the three
    # convs of a training step: forward + kernel-grad + input-grad.
    if backward:
        def body(carry, _):
            c, xi = carry

            def loss(c, xi):
                y = conv(xi, c)
                return jnp.sum(jnp.square(y.astype(jnp.float32)))
            gc, gx = jax.grad(loss, argnums=(0, 1))(c, xi)
            s = jnp.sum(gc.astype(jnp.float32)) * 1e-12
            return (c + s.astype(c.dtype),
                    xi + (jnp.sum(gx.astype(jnp.float32))
                          * 1e-12).astype(xi.dtype)), None

        @jax.jit
        def run(k):
            (c, xo), _ = jax.lax.scan(body, (k, x), None, length=REPS)
            return (jnp.sum(c.astype(jnp.float32))
                    + jnp.sum(xo.astype(jnp.float32)))
    else:
        def body(c, _):
            y = conv(x, c)
            upd = (jnp.sum(y.astype(jnp.float32)) * 1e-12).astype(k.dtype)
            return c + upd, None

        @jax.jit
        def run(k):
            c, _ = jax.lax.scan(body, k, None, length=REPS)
            return jnp.sum(c.astype(jnp.float32))

    float(run(k))          # compile + warmup, host-fetch barrier
    tdir = tempfile.mkdtemp(prefix="convprobe-")
    try:
        with jax.profiler.trace(tdir):
            float(run(k))  # the one traced dispatch
        xs = trace_top_ops.load_xspace(trace_top_ops.find_xplane(tdir))
        _, _, span_ps = trace_top_ops.device_op_totals(xs)
    finally:
        shutil.rmtree(tdir, ignore_errors=True)
    return span_ps / 1e6 / REPS   # us of device op time per conv


def main():
    for tag, h, w, cin, kh, stride in SHAPES:
        for backward in (False, True):
            row = {"shape": tag, "pass": "fwd+bwd" if backward else "fwd"}
            for cout in COUTS:
                row[f"cout{cout}_us"] = round(
                    time_conv(h, w, cin, kh, stride, cout, backward), 3)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
