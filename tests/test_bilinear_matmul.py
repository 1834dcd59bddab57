"""Matmul-based bilinear sampler must match the gather-based one exactly,
including out-of-range zero padding and gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from pivp_tpu.ops import transforms


def _rand_grid(key, b, h, w, scale=1.3):
    # Deliberately exceed [-1, 1] so zero-padding paths are hit.
    return jax.random.uniform(key, (b, h, w, 2), minval=-scale,
                              maxval=scale)


def test_matches_gather_sampler():
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 3))
    grid = _rand_grid(jax.random.PRNGKey(1), 2, 8, 8)
    a = transforms.bilinear_sample(img, grid)
    b = transforms.bilinear_sample_matmul(img, grid)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_multi_warp_grid():
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 3))
    grid = jax.random.uniform(jax.random.PRNGKey(1), (2, 4, 8, 8, 2),
                              minval=-1.2, maxval=1.2)
    a = transforms.bilinear_sample(img, grid)
    b = transforms.bilinear_sample_matmul(img, grid)
    assert b.shape == (2, 4, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)


def test_gradients_match():
    img = jax.random.uniform(jax.random.PRNGKey(0), (1, 6, 6, 2))
    grid = _rand_grid(jax.random.PRNGKey(1), 1, 6, 6, scale=1.1)

    ga = jax.grad(lambda im: jnp.sum(
        transforms.bilinear_sample(im, grid) ** 2))(img)
    gb = jax.grad(lambda im: jnp.sum(
        transforms.bilinear_sample_matmul(im, grid) ** 2))(img)
    np.testing.assert_allclose(np.asarray(ga), np.asarray(gb), rtol=1e-4,
                               atol=1e-5)

    # Grid gradients: the matmul form is differentiable in the weights
    # but its one-hot selectors are piecewise-constant in the indices —
    # same subgradient structure as the gather form.
    ha = jax.grad(lambda g: jnp.sum(
        transforms.bilinear_sample(img, g)))(grid)
    hb = jax.grad(lambda g: jnp.sum(
        transforms.bilinear_sample_matmul(img, g)))(grid)
    np.testing.assert_allclose(np.asarray(ha), np.asarray(hb), rtol=1e-4,
                               atol=1e-5)


def test_stp_apply_both_paths_agree():
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 3))
    theta = jnp.array([[[1.0, 0.1, 0.05], [-0.1, 1.0, -0.02]]] * 2)
    a = transforms.stp_apply(img, theta, use_matmul=False)
    b = transforms.stp_apply(img, theta, use_matmul=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-6)
