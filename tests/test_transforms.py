"""Unit tests for the motion-transformation primitives (CDNA/DNA/STP ops)."""

import jax
import jax.numpy as jnp
import numpy as np

from pivp_tpu.ops import transforms


def _np_shifted_stack(img, k):
    pad = k // 2
    b, h, w, c = img.shape
    padded = np.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    out = np.zeros((b, k * k, h, w, c), img.dtype)
    for dx in range(k):
        for dy in range(k):
            out[:, dx * k + dy] = padded[:, dx:dx + h, dy:dy + w]
    return out


def test_shifted_stack_matches_loop():
    img = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 3)))
    got = np.asarray(transforms.shifted_stack(jnp.asarray(img), 5))
    np.testing.assert_allclose(got, _np_shifted_stack(img, 5), rtol=1e-6)


def test_normalize_cdna_kernels():
    raw = jax.random.normal(jax.random.PRNGKey(0), (2, 4, 25))
    k = np.asarray(transforms.normalize_cdna_kernels(raw))
    assert (k > 0).all()
    np.testing.assert_allclose(k.sum(-1), 1.0, rtol=1e-5)
    # Negative logits collapse to the relu_shift floor, then normalize
    # (train_model.py:327-329).
    raw_neg = -jnp.ones((1, 1, 25))
    k2 = np.asarray(transforms.normalize_cdna_kernels(raw_neg))
    np.testing.assert_allclose(k2, 1.0 / 25.0, rtol=1e-4)


def test_cdna_apply_is_per_sample_correlation():
    """CDNA must equal an explicit per-(sample, mask, channel) 2D
    cross-correlation of the previous frame with the predicted kernel —
    the semantics of the reference's depthwise-conv trick
    (train_model.py:331-347)."""
    b, h, w, c, m, k = 2, 8, 8, 3, 4, 5
    img = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c)))
    raw = jax.random.uniform(jax.random.PRNGKey(1), (b, m, k * k)) + 0.1
    kerns = np.asarray(transforms.normalize_cdna_kernels(raw))

    got = np.asarray(transforms.cdna_apply(jnp.asarray(img),
                                           jnp.asarray(kerns)))

    pad = k // 2
    padded = np.pad(img, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    expected = np.zeros((b, m, h, w, c))
    for bi in range(b):
        for mi in range(m):
            kern = kerns[bi, mi].reshape(k, k)
            for hi in range(h):
                for wi in range(w):
                    patch = padded[bi, hi:hi + k, wi:wi + k, :]
                    expected[bi, mi, hi, wi] = np.tensordot(
                        kern, patch, axes=([0, 1], [0, 1]))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_dna_apply_per_pixel_kernels():
    b, h, w, c, k = 1, 6, 6, 2, 5
    img = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (b, h, w, c)))
    logits = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (b, h, w, k * k)) + 0.1)

    got = np.asarray(transforms.dna_apply(jnp.asarray(img),
                                          jnp.asarray(logits)))

    # Direct per-pixel expectation over the true shifted windows.
    shift = 1e-12
    kern = np.maximum(logits - shift, 0) + shift
    kern = kern / kern.sum(-1, keepdims=True)
    stack = _np_shifted_stack(img, k)              # (B, KK, H, W, C)
    expected = np.einsum("bkhwc,bhwk->bhwc", stack, kern)
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_dna_kernels_uniform_gives_box_filter():
    img = np.zeros((1, 5, 5, 1), np.float32)
    img[0, 2, 2, 0] = 1.0  # impulse
    logits = np.ones((1, 5, 5, 25), np.float32)
    out = np.asarray(transforms.dna_apply(jnp.asarray(img),
                                          jnp.asarray(logits)))
    # Uniform kernels spread the impulse into a 5x5 box of 1/25.
    np.testing.assert_allclose(out[0, :, :, 0], np.full((5, 5), 1 / 25.0),
                               rtol=1e-4)


def test_affine_grid_identity():
    theta = jnp.broadcast_to(
        jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]), (2, 2, 3))
    grid = np.asarray(transforms.affine_grid(theta, (4, 6)))
    np.testing.assert_allclose(grid[0, 0, 0], [-1.0, -1.0], atol=1e-6)
    np.testing.assert_allclose(grid[0, -1, -1], [1.0, 1.0], atol=1e-6)


def test_stp_identity_warp():
    img = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 3))
    theta = jnp.broadcast_to(
        jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]), (2, 2, 3))
    out = np.asarray(transforms.stp_apply(img, theta))
    np.testing.assert_allclose(out, np.asarray(img), rtol=1e-4, atol=1e-5)


def test_stp_translation_warp():
    """x-translation by exactly one pixel in normalized units shifts the
    image; out-of-bounds samples are zero (chainer sampler semantics)."""
    h = w = 8
    img = np.asarray(jax.random.uniform(jax.random.PRNGKey(0), (1, h, w, 1)))
    # source x = x + 2/(w-1) normalized -> sample one pixel to the right.
    tx = 2.0 / (w - 1)
    theta = jnp.array([[[1.0, 0.0, tx], [0.0, 1.0, 0.0]]])
    out = np.asarray(transforms.stp_apply(jnp.asarray(img), theta))
    np.testing.assert_allclose(out[0, :, :-1, 0], img[0, :, 1:, 0],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(out[0, :, -1, 0], 0.0, atol=1e-5)


def test_mask_composite_convexity():
    """Per-pixel softmax over M+1 mask channels; identical candidates pass
    through unchanged (convex combination)."""
    b, h, w, c, m = 2, 4, 4, 3, 5
    img = jax.random.uniform(jax.random.PRNGKey(0), (b, h, w, c))
    cand = jnp.broadcast_to(img[:, None], (b, m, h, w, c))
    logits = jax.random.normal(jax.random.PRNGKey(1), (b, h, w, m + 1))
    out, masks = transforms.mask_composite(img, cand, logits)
    np.testing.assert_allclose(np.asarray(masks).sum(-1), 1.0, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), rtol=1e-4,
                               atol=1e-5)


def test_mask_composite_selects_candidate():
    b, h, w, c, m = 1, 2, 2, 1, 2
    img = jnp.zeros((b, h, w, c))
    cand = jnp.stack([jnp.ones((b, h, w, c)), jnp.full((b, h, w, c), 2.0)],
                     axis=1)
    # Hugely favor mask channel 2 (candidate index 1).
    logits = jnp.zeros((b, h, w, m + 1)).at[..., 2].set(50.0)
    out, _ = transforms.mask_composite(img, cand, logits)
    np.testing.assert_allclose(np.asarray(out), 2.0, rtol=1e-4)
