"""Tests for scheduled sampling and the loss/quality metrics."""

import jax
import jax.numpy as jnp
import numpy as np

from pivp_tpu.ops import metrics, sampling


def test_num_ground_truth_decay():
    """Inverse sigmoid decay round(B * k/(k + e^{iter/k})) —
    train_model.py:652-657."""
    b, k = 32, 900.0
    for it in [0.0, 900.0, 5000.0, 20000.0]:
        got = int(sampling.num_ground_truth(b, k, jnp.float32(it)))
        expected = int(np.round(b * (k / (k + np.exp(it / k)))))
        assert got == expected
    # At iter 0: B * k/(k + 1) ~ B (almost everything is ground truth).
    assert int(sampling.num_ground_truth(b, k, jnp.float32(0.0))) == 32
    # Decays to 0 for large iterations.
    assert int(sampling.num_ground_truth(b, k, jnp.float32(50000.0))) == 0


def test_scheduled_sample_exact_count():
    b = 16
    gt = jnp.ones((b, 4, 4, 3))
    gen = jnp.zeros((b, 4, 4, 3))
    for n in [0, 5, 16]:
        out = sampling.scheduled_sample(jax.random.PRNGKey(42), gt, gen,
                                        jnp.int32(n))
        picked = np.asarray(out)[:, 0, 0, 0]
        assert int(picked.sum()) == n  # exactly n ground-truth rows


def test_scheduled_sample_rows_are_whole():
    """Each row is entirely GT or entirely generated, never mixed."""
    b = 8
    gt = jnp.ones((b, 3, 3, 2)) * 7.0
    gen = jnp.ones((b, 3, 3, 2)) * -2.0
    out = np.asarray(sampling.scheduled_sample(
        jax.random.PRNGKey(0), gt, gen, jnp.int32(3)))
    for row in out:
        assert np.all(row == 7.0) or np.all(row == -2.0)


def test_scheduled_sample_gradients_flow_through_generated():
    gt = jnp.ones((4, 2, 2, 1))

    def f(gen):
        out = sampling.scheduled_sample(jax.random.PRNGKey(1), gt, gen,
                                        jnp.int32(2))
        return jnp.sum(out)

    g = jax.grad(f)(jnp.zeros((4, 2, 2, 1)))
    assert np.asarray(g).sum() > 0  # generated rows contribute gradient

    def f_detached(gen):
        out = sampling.scheduled_sample(jax.random.PRNGKey(1), gt, gen,
                                        jnp.int32(2), detach_sampled=True)
        return jnp.sum(out)

    g2 = jax.grad(f_detached)(jnp.zeros((4, 2, 2, 1)))
    # Reference-compat mode: CPU round-trip detached everything
    # (train_model.py:89-122).
    np.testing.assert_allclose(np.asarray(g2), 0.0)


def test_psnr_reference_formula():
    """10*log10(1/MSE) over the whole batch — train_model.py:124-134."""
    true = jnp.zeros((2, 4, 4, 3))
    pred = jnp.full((2, 4, 4, 3), 0.5)
    psnr = float(metrics.peak_signal_to_noise_ratio(true, pred))
    np.testing.assert_allclose(psnr, 10 * np.log10(1 / 0.25), rtol=1e-5)


def test_psnr_per_image_vs_batch():
    true = jnp.zeros((2, 4, 4, 1))
    pred = jnp.stack([jnp.full((4, 4, 1), 0.1), jnp.full((4, 4, 1), 0.5)])
    batch = float(metrics.peak_signal_to_noise_ratio(true, pred))
    per_img = float(metrics.psnr_per_image(true, pred))
    mse = (0.01 + 0.25) / 2
    np.testing.assert_allclose(batch, 10 * np.log10(1 / mse), rtol=1e-4)
    expected = (10 * np.log10(1 / 0.01) + 10 * np.log10(1 / 0.25)) / 2
    np.testing.assert_allclose(per_img, expected, rtol=1e-4)


def test_ssim_identity():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 3))
    np.testing.assert_allclose(
        float(metrics.structural_similarity(x, x)), 1.0, atol=1e-4)
    y = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3))
    assert float(metrics.structural_similarity(x, y)) < 0.9


def _ssim_windowed_numpy(x, y, max_val=1.0, size=11, sigma=1.5,
                         k1=0.01, k2=0.03):
    """Independent numpy windowed SSIM (direct sliding-window loops) for
    fixture-checking metrics.ssim_per_image against Wang et al. /
    tf.image.ssim semantics."""
    ax = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g1 = np.exp(-(ax ** 2) / (2.0 * sigma ** 2))
    g1 /= g1.sum()
    win = np.outer(g1, g1)
    b, h, w, c = x.shape
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    out = np.zeros((b,))
    for bi in range(b):
        vals = []
        for ci in range(c):
            xs = x[bi, :, :, ci].astype(np.float64)
            ys = y[bi, :, :, ci].astype(np.float64)
            for i in range(h - size + 1):
                for j in range(w - size + 1):
                    px = xs[i:i + size, j:j + size]
                    py = ys[i:i + size, j:j + size]
                    mx = (win * px).sum()
                    my = (win * py).sum()
                    vx = (win * px * px).sum() - mx * mx
                    vy = (win * py * py).sum() - my * my
                    cov = (win * px * py).sum() - mx * my
                    vals.append((2 * mx * my + c1) * (2 * cov + c2)
                                / ((mx * mx + my * my + c1)
                                   * (vx + vy + c2)))
        out[bi] = np.mean(vals)
    return out


def test_ssim_windowed_matches_independent_reference():
    rng = np.random.RandomState(7)
    x = rng.rand(2, 16, 16, 3).astype(np.float32)
    # y = x plus structured + random perturbation, clipped to [0, 1].
    y = np.clip(x + 0.1 * rng.randn(2, 16, 16, 3).astype(np.float32)
                + 0.05, 0.0, 1.0).astype(np.float32)
    got = np.asarray(metrics.ssim_per_image(jnp.asarray(x),
                                            jnp.asarray(y)))
    want = _ssim_windowed_numpy(x, y)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    # Identity and range sanity.
    same = np.asarray(metrics.ssim_per_image(jnp.asarray(x),
                                             jnp.asarray(x)))
    np.testing.assert_allclose(same, 1.0, atol=1e-5)
    assert np.all(got < 1.0)


def test_ssim_small_image_falls_back_to_global():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 3))
    y = jax.random.uniform(jax.random.PRNGKey(1), (2, 8, 8, 3))
    np.testing.assert_allclose(
        np.asarray(metrics.ssim_per_image(x, y)),
        np.asarray(metrics.ssim_global_per_image(x, y)), rtol=1e-6)
