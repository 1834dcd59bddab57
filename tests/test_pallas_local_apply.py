"""Pallas local-kernel-apply op vs the XLA shifted-stack reference, in
interpreter mode (runs on CPU; the same kernel compiles on TPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from pivp_tpu.ops.pallas import local_apply as la


def _data(b=2, h=8, w=8, c=3, k=5, seed=0):
    ks = jax.random.split(jax.random.PRNGKey(seed), 2)
    x = jax.random.normal(ks[0], (b, h, w, c))
    wts = jax.random.uniform(ks[1], (b, h, w, k * k))
    wts = wts / jnp.sum(wts, -1, keepdims=True)
    return x, wts


def test_forward_matches_reference():
    x, w = _data()
    y_pallas = la.local_kernel_apply(x, w, True)  # interpret mode
    y_ref = la.local_kernel_apply_reference(x, w)
    np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)


def test_forward_3x3_kernel():
    x, w = _data(k=3)
    y_pallas = la.local_kernel_apply(x, w, True)
    y_ref = la.local_kernel_apply_reference(x, w)
    np.testing.assert_allclose(np.asarray(y_pallas), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)


def test_custom_vjp_matches_autodiff_of_reference():
    x, w = _data()
    g = jax.random.normal(jax.random.PRNGKey(7), x.shape)

    def f_pallas(x, w):
        return jnp.vdot(la.local_kernel_apply(x, w, True), g)

    def f_ref(x, w):
        return jnp.vdot(la.local_kernel_apply_reference(x, w), g)

    dx_p, dw_p = jax.grad(f_pallas, argnums=(0, 1))(x, w)
    dx_r, dw_r = jax.grad(f_ref, argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_p), np.asarray(dw_r),
                               rtol=1e-4, atol=1e-5)


def test_dna_apply_with_pallas():
    from pivp_tpu.ops import transforms

    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 3))
    logits = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 25)) + 0.1
    a = transforms.dna_apply(x, logits)
    b = transforms.dna_apply(
        x, logits, local_apply=lambda xx, ww: la.local_kernel_apply(
            xx, ww, True))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_fused_cdna_with_pallas_apply():
    from pivp_tpu.ops import transforms

    b, h, w_, c, m = 2, 8, 8, 3, 4
    ks = jax.random.split(jax.random.PRNGKey(0), 4)
    prev = jax.random.uniform(ks[0], (b, h, w_, c))
    synth = jax.random.uniform(ks[1], (b, h, w_, c))
    kerns = transforms.normalize_cdna_kernels(
        jax.random.uniform(ks[2], (b, m, 25)) + 0.1)
    logits = jax.random.normal(ks[3], (b, h, w_, m + 1))

    out_x = transforms.fused_cdna_composite(prev, synth, kerns, logits)
    out_p = transforms.fused_cdna_composite(
        prev, synth, kerns, logits,
        local_apply=lambda x, w: la.local_kernel_apply(x, w, True))
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_x),
                               rtol=1e-5, atol=1e-6)


def test_tiled_path_matches_reference():
    """H > 128 takes the H-tiled DMA layout (halo'd row windows copied
    from HBM into VMEM scratch); forward and both custom-VJP gradients
    must match the XLA reference. 192 rows -> three 64-row tiles."""
    x, w = _data(b=1, h=192, w=64)
    assert la._pick_tile(192) == 64
    y = la.local_kernel_apply(x, w, True)
    y_ref = la.local_kernel_apply_reference(x, w)
    np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref),
                               rtol=1e-5, atol=1e-6)

    g = jax.random.normal(jax.random.PRNGKey(3), x.shape)
    dx_p, dw_p = jax.grad(
        lambda a, b_: jnp.vdot(la.local_kernel_apply(a, b_, True), g),
        argnums=(0, 1))(x, w)
    dx_r, dw_r = jax.grad(
        lambda a, b_: jnp.vdot(la.local_kernel_apply_reference(a, b_), g),
        argnums=(0, 1))(x, w)
    np.testing.assert_allclose(np.asarray(dx_p), np.asarray(dx_r),
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(dw_p), np.asarray(dw_r),
                               rtol=1e-4, atol=1e-5)


def test_on_real_tpu_when_available():
    """TPU-executed numerical check (whole-frame 64x64 + H-tiled 256x256,
    f32 + bf16) via tools/check_pallas_tpu.py in a clean subprocess (this
    test env forces a CPU backend). Skipped unless PIVP_TPU_TESTS=1."""
    import os
    import subprocess
    import sys

    import pytest

    if os.environ.get("PIVP_TPU_TESTS") != "1":
        pytest.skip("set PIVP_TPU_TESTS=1 to run the TPU-executed check")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, os.path.join(root, "tools",
                                      "check_pallas_tpu.py")],
        env=env, capture_output=True, text=True, timeout=3600)
    print(proc.stdout[-2000:])
    assert proc.returncode == 0, proc.stdout[-2000:] + proc.stderr[-2000:]
