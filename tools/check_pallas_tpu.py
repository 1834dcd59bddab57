"""TPU-executed numerical check of the Pallas local-kernel-apply op.

Runs forward + custom-VJP backward against the XLA shifted-stack
reference (and its autodiff) on the REAL backend — both the whole-frame
layout (64x64, the robot-push hot path) and the H-tiled DMA layout
(256x256) — and times fwd per call. Exits non-zero on mismatch.

Run directly on a TPU host (`python tools/check_pallas_tpu.py`), or via
pytest with PIVP_TPU_TESTS=1 (tests/test_pallas_local_apply.py spawns it
in a subprocess so the CPU-forced test env doesn't apply).
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

from pivp_tpu.ops.pallas import local_apply as la  # noqa: E402

TOL = {"float32": 2e-4, "bfloat16": 2e-2}


def check(b, h, w_, dtype):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(b, h, w_, 3), dtype)
    w = jnp.asarray(rng.rand(b, h, w_, 25), dtype)
    g = jnp.asarray(rng.rand(b, h, w_, 3), dtype)

    fwd = jax.jit(lambda x_, w_: la.local_kernel_apply(x_, w_, False))
    ref_fwd = jax.jit(la.local_kernel_apply_reference)

    def loss(fn):
        return jax.jit(jax.grad(
            lambda x_, w_: jnp.sum((fn(x_, w_)
                                    * g).astype(jnp.float32)),
            argnums=(0, 1)))

    y = np.asarray(fwd(x, w), np.float32)
    y_ref = np.asarray(ref_fwd(x, w), np.float32)
    dx, dw = loss(lambda a, b_: la.local_kernel_apply(a, b_, False))(x, w)
    rdx, rdw = loss(la.local_kernel_apply_reference)(x, w)

    scale = max(1.0, float(np.abs(y_ref).max()))
    errs = {
        "fwd": float(np.abs(y - y_ref).max()) / scale,
        "dx": float(np.abs(np.float32(dx) - np.float32(rdx)).max())
        / max(1.0, float(np.abs(np.float32(rdx)).max())),
        "dw": float(np.abs(np.float32(dw) - np.float32(rdw)).max())
        / max(1.0, float(np.abs(np.float32(rdw)).max())),
    }

    # fwd timing (host-fetch barrier; see BENCHMARKS.md methodology).
    float(np.asarray(fwd(x, w)).ravel()[-1])
    t0 = time.perf_counter()
    for _ in range(10):
        out = fwd(x, w)
    float(np.asarray(out).ravel()[-1])
    ms = (time.perf_counter() - t0) / 10 * 1000

    tol = TOL[dtype]
    ok = all(e < tol for e in errs.values())
    tag = "whole-frame" if h <= 128 else "H-tiled"
    print(json.dumps({"case": f"B{b} {h}x{w_} {dtype} ({tag})",
                      **{k: round(v, 8) for k, v in errs.items()},
                      "fwd_ms": round(ms, 3), "ok": ok}))
    return ok


def check_gates(C, dtype):
    """Fused ConvLSTM gate kernel (ops/pallas/lstm_gates.py) vs its jnp
    reference + autodiff, on the real backend."""
    from pivp_tpu.ops.pallas import lstm_gates as lg

    rng = np.random.RandomState(1)
    gates = jnp.asarray(rng.randn(4, 16, 16, 4 * C) * 1.5, dtype)
    c = jnp.asarray(rng.randn(4, 16, 16, C), dtype)
    gc = jnp.asarray(rng.rand(4, 16, 16, C), dtype)
    gh = jnp.asarray(rng.rand(4, 16, 16, C), dtype)

    def loss(fn):
        def l(g_, c_):
            nc, nh = fn(g_, c_)
            return jnp.sum((nc * gc + nh * gh).astype(jnp.float32))
        return jax.jit(jax.grad(l, argnums=(0, 1)))

    kfn = lambda g_, c_: lg.fused_lstm_gates(g_, c_, 1.0)
    nc, nh = jax.jit(kfn)(gates, c)
    rnc, rnh = jax.jit(
        lambda g_, c_: lg.fused_lstm_gates_reference(g_, c_, 1.0))(gates, c)
    dg, dc = loss(kfn)(gates, c)
    rdg, rdc = loss(lambda g_, c_:
                    lg.fused_lstm_gates_reference(g_, c_, 1.0))(gates, c)

    def rel(a, b):
        return (float(np.abs(np.float32(a) - np.float32(b)).max())
                / max(1.0, float(np.abs(np.float32(b)).max())))

    errs = {"c": rel(nc, rnc), "h": rel(nh, rnh),
            "dgates": rel(dg, rdg), "dc": rel(dc, rdc)}
    tol = TOL[dtype]
    ok = all(e < tol for e in errs.values())
    print(json.dumps({"case": f"lstm_gates C{C} {dtype}",
                      **{k: round(v, 8) for k, v in errs.items()},
                      "ok": ok}))
    return ok


def main():
    platform = jax.devices()[0].platform
    print(f"backend: {platform}")
    ok = True
    ok &= check(8, 64, 64, "float32")
    ok &= check(8, 64, 64, "bfloat16")
    ok &= check(2, 256, 256, "float32")
    ok &= check(2, 256, 256, "bfloat16")
    for C in (32, 64, 128):
        ok &= check_gates(C, "float32")
        ok &= check_gates(C, "bfloat16")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
