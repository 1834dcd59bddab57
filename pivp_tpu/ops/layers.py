"""Core NHWC layer primitives: conv, transposed conv with explicit output
size, flattened-feature LayerNorm, and dense layers.

These are pure functions over explicit parameter pytrees — the TPU-native
replacement for the reference's Chainer links (`L.Convolution2D`,
`L.Deconvolution2D`, `L.LayerNormalization`, `L.Linear`;
/root/reference/src/models/train_model.py:500-529). Layout is NHWC
throughout (TPU conv-friendly), whereas the reference used Chainer's NCHW.
"""

from __future__ import annotations

import math
from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

Params = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# Initializers
# ---------------------------------------------------------------------------

def glorot_uniform(key, shape, fan_in: int, fan_out: int, dtype=jnp.float32):
    """Glorot/Xavier uniform — matches the tf-slim default the original
    TF video_prediction model (and thus the reference's architecture) was
    trained with."""
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -limit, limit)


# ---------------------------------------------------------------------------
# Convolution
# ---------------------------------------------------------------------------

_DIMENSION_NUMBERS = ("NHWC", "HWIO", "NHWC")


def conv2d_init(key, in_ch: int, out_ch: int, ksize: int,
                dtype=jnp.float32) -> Params:
    """Init a conv layer. Weight (kh, kw, in, out), zero bias
    (Chainer default bias init is zero; train_model.py:500-503)."""
    receptive = ksize * ksize
    w = glorot_uniform(key, (ksize, ksize, in_ch, out_ch),
                       fan_in=in_ch * receptive, fan_out=out_ch * receptive,
                       dtype=dtype)
    return {"w": w, "b": jnp.zeros((out_ch,), dtype)}


def conv2d(params: Params, x: jnp.ndarray, stride: int = 1,
           padding: Optional[int] = None) -> jnp.ndarray:
    """2D cross-correlation, NHWC.

    `padding=None` uses Chainer's `pad=ksize//2` convention used everywhere
    in the reference trunk (train_model.py:500-507 with pads 2/1/0).
    """
    w = params["w"].astype(x.dtype)
    k = w.shape[0]
    if padding is None:
        padding = k // 2
    out = lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_DIMENSION_NUMBERS,
    )
    return out + params["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# Transposed convolution with an explicit output size
# ---------------------------------------------------------------------------

def deconv2d_init(key, in_ch: int, out_ch: int, ksize: int,
                  dtype=jnp.float32) -> Params:
    """Init a transposed-conv layer. Weight stored as (kh, kw, in, out)."""
    receptive = ksize * ksize
    w = glorot_uniform(key, (ksize, ksize, in_ch, out_ch),
                       fan_in=in_ch * receptive, fan_out=out_ch * receptive,
                       dtype=dtype)
    return {"w": w, "b": jnp.zeros((out_ch,), dtype)}


def deconv2d(params: Params, x: jnp.ndarray, stride: int = 1,
             padding: int = 0,
             outsize: Optional[Tuple[int, int]] = None) -> jnp.ndarray:
    """Transposed conv matching Chainer `L.Deconvolution2D(..., stride,
    pad, outsize)` semantics (reference enc4/enc5/enc6 at
    train_model.py:505-507 with outsize (16,16)/(32,32)/(64,64)).

    Implemented as an input-dilated convolution with a spatially flipped
    kernel — the exact adjoint of `conv2d` with the same (ksize, stride,
    pad) — with asymmetric high-side padding absorbing the `outsize`
    adjustment `a = (out + 2*pad - k) % stride`.
    """
    w = params["w"].astype(x.dtype)
    k = w.shape[0]
    _, h, w_in, _ = x.shape
    base_h = (h - 1) * stride + k - 2 * padding
    base_w = (w_in - 1) * stride + k - 2 * padding
    if outsize is None:
        outsize = (base_h, base_w)
    out_h, out_w = outsize
    adj_h, adj_w = out_h - base_h, out_w - base_w
    if not (0 <= adj_h < stride and 0 <= adj_w < stride):
        raise ValueError(
            f"outsize {outsize} unreachable from input {(h, w_in)} with "
            f"k={k} stride={stride} pad={padding}")
    pad_lo = k - 1 - padding
    flipped = w[::-1, ::-1, :, :]
    out = lax.conv_general_dilated(
        x, flipped,
        window_strides=(1, 1),
        padding=((pad_lo, pad_lo + adj_h), (pad_lo, pad_lo + adj_w)),
        lhs_dilation=(stride, stride),
        dimension_numbers=_DIMENSION_NUMBERS,
    )
    return out + params["b"].astype(x.dtype)


# ---------------------------------------------------------------------------
# LayerNorm over the flattened feature volume
# ---------------------------------------------------------------------------

def layer_norm_flat_init(shape: Tuple[int, ...], dtype=jnp.float32) -> Params:
    """Learned per-element gamma/beta over the full (H, W, C) volume —
    matches the reference's LayerNormalizationConv2D, which flattens
    (C,H,W) into one normalized feature axis with per-element parameters
    (train_model.py:186-208 wrapping chainer L.LayerNormalization)."""
    return {"scale": jnp.ones(shape, dtype), "bias": jnp.zeros(shape, dtype)}


def layer_norm_flat(params: Params, x: jnp.ndarray,
                    eps: float = 1e-6) -> jnp.ndarray:
    """Normalize each sample over all of (H, W, C) jointly, then apply the
    learned elementwise affine. Statistics in float32 for stability
    (float64 when the input is float64 — the numerics-debug path)."""
    orig_dtype = x.dtype
    xf = x.astype(jnp.promote_types(x.dtype, jnp.float32))
    axes = tuple(range(1, x.ndim))
    # E[x] and E[x^2] have no sequential dependency, so XLA computes both
    # in ONE read pass (sibling multi-output reduce fusion); the two-pass
    # var = E[(x-mean)^2] form costs an extra full read of the activation
    # per LN — measured ~1/3 of LN time on the v5e trunk.
    mean = jnp.mean(xf, axis=axes, keepdims=True)
    mean_sq = jnp.mean(jnp.square(xf), axis=axes, keepdims=True)
    var = jnp.maximum(mean_sq - jnp.square(mean), 0.0)
    normed = (xf - mean) * lax.rsqrt(var + eps)
    out = normed * params["scale"] + params["bias"]
    return out.astype(orig_dtype)


# ---------------------------------------------------------------------------
# Dense
# ---------------------------------------------------------------------------

def dense_init(key, in_dim: int, out_dim: int, dtype=jnp.float32) -> Params:
    w = glorot_uniform(key, (in_dim, out_dim), fan_in=in_dim,
                       fan_out=out_dim, dtype=dtype)
    return {"w": w, "b": jnp.zeros((out_dim,), dtype)}


def dense(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    w = params["w"].astype(x.dtype)
    # Accumulate in f32 on the MXU even under bf16 compute.
    acc = jnp.promote_types(x.dtype, jnp.float32)
    out = jnp.dot(x, w, preferred_element_type=acc)
    return out.astype(x.dtype) + params["b"].astype(x.dtype)
