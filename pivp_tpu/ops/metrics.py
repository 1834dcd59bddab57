"""Loss and image-quality metrics.

Reference: mean_squared_error / peak_signal_to_noise_ratio usage at
/root/reference/src/models/train_model.py:124-134 and 736-764.
"""

from __future__ import annotations

import jax.numpy as jnp


def mean_squared_error(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(x.astype(jnp.float32) -
                               y.astype(jnp.float32)))


def peak_signal_to_noise_ratio(true: jnp.ndarray,
                               pred: jnp.ndarray) -> jnp.ndarray:
    """PSNR over the whole batch, 10*log10(1/MSE) — exactly the reference
    formulation (train_model.py:124-134), which computes one PSNR for the
    full batch rather than averaging per-image PSNRs (acknowledged as "not
    quite correct" in the reference's preface notebook; kept for parity)."""
    mse = mean_squared_error(true, pred)
    return 10.0 * jnp.log(1.0 / mse) / jnp.log(10.0)


def per_image_mse(true: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """Per-sample MSE (B,) — the building block for batch-size-invariant
    validation aggregation (padded rows can be masked exactly)."""
    axes = tuple(range(1, true.ndim))
    return jnp.mean(jnp.square(true.astype(jnp.float32) -
                               pred.astype(jnp.float32)), axis=axes)


def psnr_per_image(true: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """Corrected per-image PSNR, averaged over the batch (the metric the
    reference acknowledges it should have computed)."""
    mse = per_image_mse(true, pred)
    return jnp.mean(10.0 * jnp.log(1.0 / mse) / jnp.log(10.0))


def ssim_per_image(x: jnp.ndarray, y: jnp.ndarray,
                   max_val: float = 1.0) -> jnp.ndarray:
    """Global (non-windowed) SSIM per sample, shape (B,)."""
    axes = tuple(range(1, x.ndim))
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    mu_x = jnp.mean(xf, axis=axes)
    mu_y = jnp.mean(yf, axis=axes)
    var_x = jnp.var(xf, axis=axes)
    var_y = jnp.var(yf, axis=axes)
    cov = jnp.mean((xf - mu_x.reshape((-1,) + (1,) * (x.ndim - 1)))
                   * (yf - mu_y.reshape((-1,) + (1,) * (y.ndim - 1))),
                   axis=axes)
    c1 = (0.01 * max_val) ** 2
    c2 = (0.03 * max_val) ** 2
    return ((2 * mu_x * mu_y + c1) * (2 * cov + c2) /
            ((mu_x ** 2 + mu_y ** 2 + c1) * (var_x + var_y + c2)))


def structural_similarity(x: jnp.ndarray, y: jnp.ndarray,
                          max_val: float = 1.0) -> jnp.ndarray:
    """Global (non-windowed) SSIM over each image, averaged over the batch.

    Used by the parity/bench harness (BASELINE.json gates on PSNR/SSIM);
    the reference itself has no SSIM implementation.
    """
    return jnp.mean(ssim_per_image(x, y, max_val))
