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
