"""Pallas TPU kernel: per-pixel K*K local kernel application with a
custom VJP — the hot op of the CDNA/DNA motion heads.

    y[b, h, w, c] = sum_t  W[b, h, w, t] * x_pad[b, h + dx_t, w + dy_t, c]
    (t = dx*K + dy, pad = K//2, zero padding)

This is the "dynamic neural advection" expectation (reference
train_model.py:408-414) and, via the fused-CDNA identity
(transforms.fused_cdna_composite), also the CDNA transform+composite.
The XLA fallback materializes a K^2-tap shifted stack in HBM; this kernel
streams the padded frame into VMEM once per sample and accumulates all
K^2 shifted products in registers/VMEM — no stack materialization in
either the forward or backward pass.

Layout: channel-planar (B, C, H, W) inside the kernel (W on lanes, H on
sublanes); the public wrapper takes/returns NHWC. The per-pixel kernels
ride along as (K*K, H, W) planes so each tap is a cheap leading-index
slice.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fwd_kernel(xp_ref, w_ref, y_ref, *, ksize: int, height: int,
                width: int, channels: int):
    # xp_ref: (1, C, H+2p, W+2p); w_ref: (1, KK, H, W); y_ref: (1, C, H, W)
    for c in range(channels):
        acc = jnp.zeros((height, width), jnp.float32)
        for t in range(ksize * ksize):
            dx, dy = divmod(t, ksize)
            win = xp_ref[0, c, dx:dx + height, dy:dy + width]
            acc += w_ref[0, t].astype(jnp.float32) * \
                win.astype(jnp.float32)
        y_ref[0, c] = acc.astype(y_ref.dtype)


def _bwd_w_kernel(xp_ref, g_ref, dw_ref, *, ksize: int, height: int,
                  width: int, channels: int):
    # dW[t] = sum_c g[c] * window_t(xp[c])
    for t in range(ksize * ksize):
        dx, dy = divmod(t, ksize)
        acc = jnp.zeros((height, width), jnp.float32)
        for c in range(channels):
            win = xp_ref[0, c, dx:dx + height, dy:dy + width]
            acc += g_ref[0, c].astype(jnp.float32) * \
                win.astype(jnp.float32)
        dw_ref[0, t] = acc.astype(dw_ref.dtype)


def _bwd_x_kernel(w_ref, g_ref, dx_ref, scratch, *, ksize: int,
                  height: int, width: int, channels: int):
    # dX[q] = sum_t (w_t * g)[q - delta_t + p]  (transposed shifts):
    # pad P_t = w_t*g by p each side, then read the flipped-tap windows.
    pad = ksize // 2
    for c in range(channels):
        acc = jnp.zeros((height, width), jnp.float32)
        for t in range(ksize * ksize):
            dx, dy = divmod(t, ksize)
            scratch[...] = jnp.zeros_like(scratch)
            scratch[pad:pad + height, pad:pad + width] = (
                w_ref[0, t].astype(jnp.float32)
                * g_ref[0, c].astype(jnp.float32))
            fx, fy = 2 * pad - dx, 2 * pad - dy
            acc += scratch[fx:fx + height, fy:fy + width]
        dx_ref[0, c] = acc.astype(dx_ref.dtype)


def _prep(x: jnp.ndarray, w: jnp.ndarray):
    b, h, wd, c = x.shape
    ksq = w.shape[-1]
    k = int(round(math.sqrt(ksq)))
    pad = k // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    xp = jnp.transpose(xp, (0, 3, 1, 2))          # (B, C, H+2p, W+2p)
    wt = jnp.transpose(w, (0, 3, 1, 2))           # (B, KK, H, W)
    return xp, wt, (b, h, wd, c, k, pad)


def _fwd_call(x: jnp.ndarray, w: jnp.ndarray,
              interpret: bool = False) -> jnp.ndarray:
    xp, wt, (b, h, wd, c, k, pad) = _prep(x, w)
    kern = functools.partial(_fwd_kernel, ksize=k, height=h, width=wd,
                             channels=c)
    y = pl.pallas_call(
        kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h + 2 * pad, wd + 2 * pad),
                         lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, k * k, h, wd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, h, wd), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, h, wd), x.dtype),
        interpret=interpret,
    )(xp, wt)
    return jnp.transpose(y, (0, 2, 3, 1))


def _bwd_call(x: jnp.ndarray, w: jnp.ndarray, g: jnp.ndarray,
              interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    xp, wt, (b, h, wd, c, k, pad) = _prep(x, w)
    gt = jnp.transpose(g, (0, 3, 1, 2))           # (B, C, H, W)

    dw_kern = functools.partial(_bwd_w_kernel, ksize=k, height=h,
                                width=wd, channels=c)
    dwt = pl.pallas_call(
        dw_kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h + 2 * pad, wd + 2 * pad),
                         lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h, wd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, k * k, h, wd), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, k * k, h, wd), w.dtype),
        interpret=interpret,
    )(xp, gt)
    dw = jnp.transpose(dwt, (0, 2, 3, 1))

    dx_kern = functools.partial(_bwd_x_kernel, ksize=k, height=h,
                                width=wd, channels=c)
    dxt = pl.pallas_call(
        dx_kern,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, k * k, h, wd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, h, wd), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, c, h, wd), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, c, h, wd), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((h + 2 * pad, wd + 2 * pad), jnp.float32)],
        interpret=interpret,
    )(wt, gt)
    dx = jnp.transpose(dxt, (0, 2, 3, 1))
    return dx, dw


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def local_kernel_apply(x: jnp.ndarray, w: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """y[b,h,w,c] = sum_t W[b,h,w,t] * shift_t(x)[b,h,w,c].

    x: (B, H, W, C); w: (B, H, W, K*K) per-pixel kernels (any
    normalization is the caller's job). Differentiable in x and w.
    """
    return _fwd_call(x, w, interpret)


def _vjp_fwd(x, w, interpret):
    return _fwd_call(x, w, interpret), (x, w)


def _vjp_bwd(interpret, res, g):
    x, w = res
    dx, dw = _bwd_call(x, w, g, interpret)
    return dx, dw


local_kernel_apply.defvjp(_vjp_fwd, _vjp_bwd)


def local_kernel_apply_reference(x: jnp.ndarray,
                                 w: jnp.ndarray) -> jnp.ndarray:
    """XLA shifted-stack reference implementation (for tests/bench)."""
    from pivp_tpu.ops import transforms

    ksq = w.shape[-1]
    k = int(round(math.sqrt(ksq)))
    stack = transforms.shifted_stack(x, k)
    return jnp.einsum("bkhwc,bhwk->bhwc", stack, w.astype(stack.dtype))
