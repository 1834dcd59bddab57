"""Core NHWC layer primitives: conv, transposed conv with explicit output
size, flattened-feature LayerNorm, and dense layers.

These are pure functions over explicit parameter pytrees — the TPU-native
replacement for the reference's Chainer links (`L.Convolution2D`,
`L.Deconvolution2D`, `L.LayerNormalization`, `L.Linear`;
/root/reference/src/models/train_model.py:500-529). Layout is NHWC
throughout (TPU conv-friendly), whereas the reference used Chainer's NCHW.
"""

from __future__ import annotations

import functools
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


def _raw_conv(x: jnp.ndarray, w: jnp.ndarray, stride: int,
              padding: int) -> jnp.ndarray:
    return lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=_DIMENSION_NUMBERS,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _conv_cin_padded(x, w, stride, padding, pad_to):
    return _conv_cin_padded_fwd(x, w, stride, padding, pad_to)[0]


def _conv_cin_padded_fwd(x, w, stride, padding, pad_to):
    """Forward: zero-pad the contraction (input-channel) dim to `pad_to`
    so the MXU K tile is full — exact, zero channels contribute 0. The
    v5e conv lowering contracts cin per kernel position; cin=64 runs at
    ~half the rate of cin=128 on otherwise identical convs (measured,
    tools/conv_shape_attribution.py)."""
    pad = pad_to - x.shape[-1]
    xp = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad)))
    wp = jnp.pad(w, ((0, 0), (0, 0), (0, pad), (0, 0)))
    return _raw_conv(xp, wp, stride, padding), (x, w)


def _conv_cin_padded_bwd(stride, padding, pad_to, res, dy):
    # Standard UNPADDED conv grads: the backward-to-input conv contracts
    # over cout (already wide) and the backward-to-weight conv would
    # double its FLOPs for discarded pad rows if padded.
    x, w = res
    _, vjp = jax.vjp(lambda xx, ww: _raw_conv(xx, ww, stride, padding),
                     x, w)
    return vjp(dy)


_conv_cin_padded.defvjp(_conv_cin_padded_fwd, _conv_cin_padded_bwd)


@jax.custom_vjp
def _conv1x1_hybrid(x, w):
    """1x1 stride-1 pad-0 conv: CONV forward (fuses with its LN/relu
    producer), DOT backward. Per-shape attribution showed the conv
    path's backward-to-input at 1.6% MFU / 75 us per op on the
    [B,64,64,64]x[1,1,64,14] merged output conv (3x its bandwidth
    floor) while the forward conv is fine — so only the backward is
    rerouted through the MXU dot lowering."""
    return _raw_conv(x, w, 1, 0)


def _conv1x1_hybrid_fwd(x, w):
    return _raw_conv(x, w, 1, 0), (x, w)


def _conv1x1_hybrid_bwd(res, dy):
    x, w = res
    b, h, wd, ci = x.shape
    co = w.shape[-1]
    w2 = w.reshape(ci, co)
    dy2 = dy.reshape(b * h * wd, co)
    dx = jnp.dot(dy2, w2.T).reshape(x.shape)
    dw = jnp.dot(x.reshape(b * h * wd, ci).T, dy2).reshape(w.shape)
    return dx, dw


_conv1x1_hybrid.defvjp(_conv1x1_hybrid_fwd, _conv1x1_hybrid_bwd)


def _matmul_1x1(x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
    """A 1x1 stride-1 pad-0 conv as an explicit (B*H*W, Cin) x
    (Cin, Cout) matmul — identical contraction, but lowered through
    XLA's dot path instead of the convolution tiler. Why this exists:
    per-shape trace attribution (tools/conv_shape_attribution.py) showed
    the [B,64,64,64]x[1,1,64,14] merged output conv running at 0.8-6%
    MFU through the conv lowering, with a batch-dependent cliff at b64
    (fwd 314 us/op vs 20 us/op at b32 for 2x the work)."""
    b, h, wd, c = x.shape
    y = jnp.dot(x.reshape(b * h * wd, c), w.reshape(w.shape[-2:]))
    return y.reshape(b, h, wd, -1)


def conv2d(params: Params, x: jnp.ndarray, stride: int = 1,
           padding: Optional[int] = None,
           pad_cin_to: int = 0,
           as_matmul: bool = False) -> jnp.ndarray:
    """2D cross-correlation, NHWC.

    `padding=None` uses Chainer's `pad=ksize//2` convention used everywhere
    in the reference trunk (train_model.py:500-507 with pads 2/1/0).
    `pad_cin_to=N` zero-pads input channels to N in the forward pass only
    (applies when cin < N; see _conv_cin_padded).
    `as_matmul=True` lowers a 1x1 stride-1 pad-0 conv via the dot path.
    """
    w = params["w"].astype(x.dtype)
    k = w.shape[0]
    if padding is None:
        padding = k // 2
    if as_matmul and k == 1 and stride == 1 and padding == 0:
        out = (_conv1x1_hybrid(x, w) if as_matmul == "bwd"
               else _matmul_1x1(x, w))
    elif pad_cin_to and x.shape[-1] < pad_cin_to:
        out = _conv_cin_padded(x, w, stride, padding, pad_cin_to)
    else:
        out = _raw_conv(x, w, stride, padding)
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
             outsize: Optional[Tuple[int, int]] = None,
             as_matmul: bool = False) -> jnp.ndarray:
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
    if (as_matmul and k == 1 and stride == 1 and padding == 0
            and outsize in (None, x.shape[1:3])):
        # 1x1 stride-1 transposed conv == 1x1 conv (flip is identity).
        out = (_conv1x1_hybrid(x, w) if as_matmul == "bwd"
               else _matmul_1x1(x, w))
        return out + params["b"].astype(x.dtype)
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
# Space-to-depth stem conv (the classic TPU first-layer transform)
# ---------------------------------------------------------------------------

def _s2d_weight(w: jnp.ndarray) -> jnp.ndarray:
    """Rearrange a (5, 5, C, O) stride-2 kernel into the equivalent
    (3, 3, 4*C, O) stride-1 kernel over 2x2 space-to-depth blocks.

    Derivation: output i reads input rows r = 2i + di - 2, di in [0, 5).
    In block coords r = 2(i + bI) + p with bI in {-1, 0, 1}, p in {0, 1},
    so di = 2*bI + p + 2; (bI=1, p=1) -> di=5 is out of range and stays
    zero (33 of 144 taps are structural zeros). Same multiply-add set as
    the original conv — exact up to float reduction order.
    """
    k, _, c, o = w.shape
    assert k == 5, "space-to-depth transform is for the 5x5 stride-2 stem"
    w2 = jnp.zeros((3, 3, 2, 2, c, o), w.dtype)
    for b_i in range(3):
        for p in range(2):
            di = 2 * (b_i - 1) + p + 2
            if not 0 <= di < k:
                continue
            for b_j in range(3):
                for q in range(2):
                    dj = 2 * (b_j - 1) + q + 2
                    if not 0 <= dj < k:
                        continue
                    w2 = w2.at[b_i, b_j, p, q].set(w[di, dj])
    return w2.reshape(3, 3, 4 * c, o)


def conv2d_s2d(params: Params, x: jnp.ndarray) -> jnp.ndarray:
    """enc0 as a space-to-depth conv: (B, H, W, C) -> (B, H/2, W/2, O)
    computing EXACTLY conv2d(params, x, stride=2) for a 5x5 kernel with
    pad=2, but as a stride-1 3x3 conv on the (H/2, W/2, 4C)-packed input.

    Why: the reference layout's backward-to-input conv emits N=C (=3)
    output channels through an lhs_dilated window — measured 4.5% MFU,
    ~70 us/op on v5e (tools/conv_shape_attribution.py). In s2d coords
    the backward is a plain stride-1 conv producing 4C channels plus a
    free depth-to-space reshape.
    """
    w = params["w"].astype(x.dtype)
    b, h, wd, c = x.shape
    x2 = x.reshape(b, h // 2, 2, wd // 2, 2, c).transpose(
        0, 1, 3, 2, 4, 5).reshape(b, h // 2, wd // 2, 4 * c)
    out = lax.conv_general_dilated(
        x2, _s2d_weight(w),
        window_strides=(1, 1),
        padding=((1, 1), (1, 1)),
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
