"""Pallas TPU kernel: fused ConvLSTM gate update with a custom VJP.

Computes, from the pre-activation gate conv output (reference
BasicConvLSTMCell, /root/reference/src/models/train_model.py:262-272):

    j, i, f, o = split(gates, 4, axis=-1)          # (B, H, W, C) each
    new_c = c * sigmoid(f + forget_bias) + sigmoid(i) * tanh(j)
    new_h = tanh(new_c) * sigmoid(o)

as ONE VMEM pass: read gates (4C) + c (C), write new_c (C) + new_h (C).
The XLA fallback path (ops/convlstm.py) lowers to several elementwise
loop fusions whose intermediates round-trip HBM — the round-2 trace
attributed ~10 ms/step to them at the bench config.

Numerics: gate math always runs in float32 REGISTERS regardless of the
storage dtype — in a single fused pass the f32 precision is free (HBM
traffic is set by the bf16 I/O, compute is VPU-bound), so this kernel is
simultaneously reference-exact (f32 gates) and as cheap as the bf16-gate
XLA path. Outputs are rounded to the carry dtype as before.

The backward pass is also one fused kernel: it recomputes the (cheap,
VPU-bound) activations from the saved inputs instead of storing them —
residuals are just (gates, c), which the surrounding graph already keeps.

Layout: spatial/batch dims are flattened to rows (sublanes); channels sit
on lanes. 4C is always a multiple of 128 for this model's cells
(C in {32, 64, 128}), so gate slices are lane-aligned at worst to 32.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _padded_lanes(c: int) -> int:
    """Mosaic pads the lane (last) dim of every block to 128, so a
    (tile, 32) block occupies (tile, 128) of VMEM."""
    return max(c, 128)


def _row_tile(n_rows: int, per_row_lanes: int, itemsize: int) -> int:
    """Largest power-of-two row tile that divides n_rows and keeps the
    kernel's total VMEM footprint (all in+out blocks at PADDED lane
    width, x2 for pipeline double-buffering) under ~6 MB of the 16 MB
    budget."""
    budget = 6 << 20
    limit = max(128, budget // (2 * per_row_lanes * itemsize))
    tile = 1 << (limit.bit_length() - 1)
    tile = min(tile, n_rows)
    while n_rows % tile:
        tile //= 2
    return max(tile, 1)


def _gate_parts(g32, c32, forget_bias: float, C: int):
    j = g32[:, 0 * C:1 * C]
    i = g32[:, 1 * C:2 * C]
    f = g32[:, 2 * C:3 * C]
    o = g32[:, 3 * C:4 * C]
    s_i = jax.nn.sigmoid(i)
    s_f = jax.nn.sigmoid(f + forget_bias)
    s_o = jax.nn.sigmoid(o)
    t_j = jnp.tanh(j)
    new_c = c32 * s_f + s_i * t_j
    return s_i, s_f, s_o, t_j, new_c


def _fwd_kernel(gates_ref, c_ref, newc_ref, newh_ref, *, C: int,
                forget_bias: float):
    g32 = gates_ref[...].astype(jnp.float32)
    c32 = c_ref[...].astype(jnp.float32)
    _, _, s_o, _, new_c = _gate_parts(g32, c32, forget_bias, C)
    new_h = jnp.tanh(new_c) * s_o
    newc_ref[...] = new_c.astype(newc_ref.dtype)
    newh_ref[...] = new_h.astype(newh_ref.dtype)


def _bwd_kernel(gates_ref, c_ref, gc_ref, gh_ref, dgates_ref, dc_ref, *,
                C: int, forget_bias: float):
    g32 = gates_ref[...].astype(jnp.float32)
    c32 = c_ref[...].astype(jnp.float32)
    g_c = gc_ref[...].astype(jnp.float32)
    g_h = gh_ref[...].astype(jnp.float32)
    s_i, s_f, s_o, t_j, new_c = _gate_parts(g32, c32, forget_bias, C)
    t_c = jnp.tanh(new_c)
    # d(loss)/d(new_c) including the tanh(new_c) path of new_h.
    dct = g_c + g_h * s_o * (1.0 - t_c * t_c)
    dj = dct * s_i * (1.0 - t_j * t_j)
    di = dct * t_j * (s_i * (1.0 - s_i))
    df = dct * c32 * (s_f * (1.0 - s_f))
    do = g_h * t_c * (s_o * (1.0 - s_o))
    dgates_ref[...] = jnp.concatenate([dj, di, df, do],
                                      axis=-1).astype(dgates_ref.dtype)
    dc_ref[...] = (dct * s_f).astype(dc_ref.dtype)


def _flatten(x):
    return x.reshape(-1, x.shape[-1])


def _fwd_call(gates, c, forget_bias, interpret):
    C = c.shape[-1]
    if gates.shape[-1] != 4 * C:
        raise ValueError(f"gates last dim {gates.shape[-1]} != 4*{C}")
    g2 = _flatten(gates)
    c2 = _flatten(c)
    n = g2.shape[0]
    # Blocks: gates(4C) + c + new_c + new_h at padded lane width.
    per_row = 4 * C + 3 * _padded_lanes(C)
    tile = _row_tile(n, per_row, jnp.dtype(gates.dtype).itemsize)
    out_sd = jax.ShapeDtypeStruct((n, C), c.dtype)
    newc, newh = pl.pallas_call(
        functools.partial(_fwd_kernel, C=C,
                          forget_bias=float(forget_bias)),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, 4 * C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(out_sd, out_sd),
        interpret=interpret,
    )(g2, c2)
    return newc.reshape(c.shape), newh.reshape(c.shape)


def _bwd_call(gates, c, g_newc, g_newh, forget_bias, interpret):
    C = c.shape[-1]
    g2 = _flatten(gates)
    c2 = _flatten(c)
    gc2 = _flatten(g_newc)
    gh2 = _flatten(g_newh)
    n = g2.shape[0]
    # Blocks: gates(4C) + c + g_c + g_h + dgates(4C) + dc, padded lanes.
    per_row = 8 * C + 4 * _padded_lanes(C)
    tile = _row_tile(n, per_row, jnp.dtype(gates.dtype).itemsize)
    dgates, dc = pl.pallas_call(
        functools.partial(_bwd_kernel, C=C,
                          forget_bias=float(forget_bias)),
        grid=(n // tile,),
        in_specs=[
            pl.BlockSpec((tile, 4 * C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile, 4 * C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, C), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(jax.ShapeDtypeStruct((n, 4 * C), gates.dtype),
                   jax.ShapeDtypeStruct((n, C), c.dtype)),
        interpret=interpret,
    )(g2, c2, gc2, gh2)
    return dgates.reshape(gates.shape), dc.reshape(c.shape)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def fused_lstm_gates(gates: jnp.ndarray, c: jnp.ndarray,
                     forget_bias: float = 1.0,
                     interpret: bool = False
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Fused ConvLSTM gate update.

    gates: (B, H, W, 4C) pre-activation conv output in (j, i, f, o)
    channel-block order (reference train_model.py:269); c: (B, H, W, C)
    carry. Returns (new_c, new_h), both in c's dtype. Gate math in f32.
    """
    return _fwd_call(gates, c, forget_bias, interpret)


def _vjp_fwd(gates, c, forget_bias, interpret):
    return _fwd_call(gates, c, forget_bias, interpret), (gates, c)


def _vjp_bwd(forget_bias, interpret, res, cotangents):
    gates, c = res
    g_newc, g_newh = cotangents
    return _bwd_call(gates, c, g_newc, g_newh, forget_bias, interpret)


fused_lstm_gates.defvjp(_vjp_fwd, _vjp_bwd)


def fused_lstm_gates_reference(gates: jnp.ndarray, c: jnp.ndarray,
                               forget_bias: float = 1.0
                               ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Pure-jnp reference (f32 gate math) for tests/bench."""
    C = c.shape[-1]
    g32 = gates.astype(jnp.float32)
    c32 = c.astype(jnp.float32)
    j, i, f, o = jnp.split(g32, 4, axis=-1)
    new_c = (c32 * jax.nn.sigmoid(f + forget_bias)
             + jax.nn.sigmoid(i) * jnp.tanh(j))
    new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o)
    return new_c.astype(c.dtype), new_h.astype(c.dtype)
