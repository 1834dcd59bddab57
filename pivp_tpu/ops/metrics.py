"""Loss and image-quality metrics.

Reference: mean_squared_error / peak_signal_to_noise_ratio usage at
/root/reference/src/models/train_model.py:124-134 and 736-764.

SSIM comes in two flavors:
  * `ssim_per_image` / `structural_similarity` — windowed SSIM (11x11
    Gaussian, sigma 1.5, k1/k2 per Wang et al. 2004; `tf.image.ssim`
    semantics with VALID filtering), the literature-comparable metric
    used by validation and the bench harness.
  * `ssim_global_per_image` / `ssim_global` — single global window over
    the whole image (cheap, relative-quality gate only; this was the
    pre-round-3 "ssim" and is explicitly NOT comparable to published
    SSIM numbers).
The reference itself has no SSIM implementation.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
from jax import lax


def _accf(x: jnp.ndarray) -> jnp.ndarray:
    """Cast to the accumulation dtype: float32, or float64 when the input
    is already float64 (the numerics-debug path)."""
    return x.astype(jnp.promote_types(x.dtype, jnp.float32))


def mean_squared_error(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    return jnp.mean(jnp.square(_accf(x) - _accf(y)))


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
    return jnp.mean(jnp.square(_accf(true) - _accf(pred)), axis=axes)


def psnr_per_image(true: jnp.ndarray, pred: jnp.ndarray) -> jnp.ndarray:
    """Corrected per-image PSNR, averaged over the batch (the metric the
    reference acknowledges it should have computed)."""
    mse = per_image_mse(true, pred)
    return jnp.mean(10.0 * jnp.log(1.0 / mse) / jnp.log(10.0))


# ---------------------------------------------------------------------------
# Windowed SSIM (Wang et al. 2004 / tf.image.ssim semantics)
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _gauss_1d(size: int, sigma: float):
    import numpy as np
    x = np.arange(size, dtype=np.float64) - (size - 1) / 2.0
    g = np.exp(-(x ** 2) / (2.0 * sigma ** 2))
    return tuple((g / g.sum()).tolist())


def ssim_per_image(x: jnp.ndarray, y: jnp.ndarray, max_val: float = 1.0,
                   filter_size: int = 11, filter_sigma: float = 1.5,
                   k1: float = 0.01, k2: float = 0.03) -> jnp.ndarray:
    """Windowed SSIM per sample, shape (B,), for NHWC inputs.

    Matches `tf.image.ssim`: an 11x11 Gaussian (sigma 1.5) depthwise
    filter with VALID padding produces local means; variances/covariance
    use the E[x^2]-mu^2 form; the SSIM map is averaged over space and
    channels. Images smaller than the filter fall back to the global
    single-window formula (equivalent to filter covering the image).
    """
    if x.ndim != 4:
        raise ValueError(f"ssim_per_image expects (B,H,W,C), got {x.shape}")
    h, w, c = x.shape[1], x.shape[2], x.shape[3]
    if h < filter_size or w < filter_size:
        return ssim_global_per_image(x, y, max_val)
    dt = jnp.promote_types(x.dtype, jnp.float32)
    xf = x.astype(dt)
    yf = y.astype(dt)
    g = jnp.asarray(_gauss_1d(filter_size, filter_sigma), dt)
    win = jnp.outer(g, g)                                   # (K, K)
    # Depthwise: rhs (K, K, in/groups=1, out=C), feature_group_count=C.
    kern = jnp.tile(win[:, :, None, None], (1, 1, 1, c))

    def filt(t):
        return lax.conv_general_dilated(
            t, kern, window_strides=(1, 1), padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c)

    mu_x = filt(xf)
    mu_y = filt(yf)
    var_x = filt(xf * xf) - mu_x * mu_x
    var_y = filt(yf * yf) - mu_y * mu_y
    cov = filt(xf * yf) - mu_x * mu_y
    c1 = (k1 * max_val) ** 2
    c2 = (k2 * max_val) ** 2
    ssim_map = ((2.0 * mu_x * mu_y + c1) * (2.0 * cov + c2) /
                ((mu_x ** 2 + mu_y ** 2 + c1) * (var_x + var_y + c2)))
    return jnp.mean(ssim_map, axis=(1, 2, 3))


def structural_similarity(x: jnp.ndarray, y: jnp.ndarray,
                          max_val: float = 1.0) -> jnp.ndarray:
    """Windowed SSIM averaged over the batch (see `ssim_per_image`)."""
    return jnp.mean(ssim_per_image(x, y, max_val))


# ---------------------------------------------------------------------------
# Global (single-window) SSIM — cheap relative gate, NOT literature SSIM
# ---------------------------------------------------------------------------

def ssim_global_per_image(x: jnp.ndarray, y: jnp.ndarray,
                          max_val: float = 1.0) -> jnp.ndarray:
    """Global (non-windowed) SSIM per sample, shape (B,)."""
    axes = tuple(range(1, x.ndim))
    xf = _accf(x)
    yf = _accf(y)
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


def ssim_global(x: jnp.ndarray, y: jnp.ndarray,
                max_val: float = 1.0) -> jnp.ndarray:
    """Global (non-windowed) SSIM averaged over the batch."""
    return jnp.mean(ssim_global_per_image(x, y, max_val))
