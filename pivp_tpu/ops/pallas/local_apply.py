"""Pallas TPU kernel: per-pixel K*K local kernel application with a
custom VJP — the hot op of the CDNA/DNA motion heads.

    y[b, h, w, c] = sum_t  W[b, h, w, t] * x_pad[b, h + dx_t, w + dy_t, c]
    (t = dx*K + dy, pad = K//2, zero padding)

This is the "dynamic neural advection" expectation (reference
train_model.py:408-414) and, via the fused-CDNA identity
(transforms.fused_cdna_composite), also the CDNA transform+composite.
The XLA fallback materializes a K^2-tap shifted stack in HBM; this kernel
accumulates all K^2 shifted products in VMEM — no stack materialization
in either the forward or backward pass.

Layout: channel-planar (B, C, H, W) inside the kernel (W on lanes, H on
sublanes); the public wrapper takes/returns NHWC. The per-pixel kernels
ride along as (K*K, H, W) planes so each tap is a cheap leading-index
slice, and the tap loop broadcasts over the whole channel axis (no
per-channel unrolling — compile time is O(K^2), independent of C).

Two execution layouts, chosen by image height:
  * whole-frame (H <= 128, the 64x64 robot-push hot path): one grid step
    per sample, every operand a plain VMEM block;
  * H-tiled (larger frames): grid (B, H/tile); the halo'd operands
    (padded frame; padded w*g planes in the input-gradient pass) stay in
    HBM (`pltpu.ANY`) and each grid step DMAs its `tile + 2*pad` row
    window into VMEM scratch (`pltpu.make_async_copy`). All inputs are
    pre-padded by `pad` rows, so every DMA window is static-size and
    in-bounds. VMEM per step is O(tile * W), so the kernel holds at
    256x256 and beyond where whole-frame blocks would blow VMEM.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _pick_tile(h: int) -> int:
    """Whole frame up to 128 rows; 64-row tiles when they divide H."""
    return 64 if (h > 128 and h % 64 == 0) else h


def _sublane(dtype) -> int:
    """Minimum sublane tiling for the dtype (Mosaic requires DMA slice
    sizes on the second-to-last dim to be multiples of this)."""
    return {4: 8, 2: 16, 1: 32}[jnp.dtype(dtype).itemsize]


def _halo_rows(pad: int, dtype) -> int:
    """Halo row count rounded up to the sublane tiling, so the DMA'd
    window (tile + halo rows) stays tiling-aligned."""
    sub = _sublane(dtype)
    return -(-2 * pad // sub) * sub


def _pads(h: int, wd: int, pad: int, tile: int, dtype):
    """(row_pad, col_pad, halo, padded_cols). The tiled DMA path needs
    Mosaic-aligned slice sizes: rows to the sublane tiling, cols to 128
    lanes; whole-frame VMEM blocks take the true 2*pad halo."""
    halo = _halo_rows(pad, dtype)
    if tile == h:
        return (pad, pad), (pad, pad), halo, wd + 2 * pad
    cols = -(-(wd + 2 * pad) // 128) * 128
    return (pad, halo - pad), (pad, cols - wd - pad), halo, cols


# ---------------------------------------------------------------------------
# Forward: y = sum_t w_t * shift_t(x)
# ---------------------------------------------------------------------------

def _fwd_whole(xp_ref, w_ref, y_ref, *, ksize: int, height: int,
               width: int):
    # xp: (1, C, H+2p, W+2p); w: (1, KK, H, W); y: (1, C, H, W)
    acc = jnp.zeros(y_ref.shape[1:], jnp.float32)
    for t in range(ksize * ksize):
        dx, dy = divmod(t, ksize)
        win = xp_ref[0, :, dx:dx + height, dy:dy + width]
        acc += w_ref[0, t][None].astype(jnp.float32) * \
            win.astype(jnp.float32)
    y_ref[0] = acc.astype(y_ref.dtype)


def _fwd_tiled(xp_hbm, w_ref, y_ref, scratch, sem, *, ksize: int,
               tile: int, width: int, halo: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    cp = pltpu.make_async_copy(
        xp_hbm.at[i, :, pl.ds(j * tile, tile + halo), :], scratch, sem)
    cp.start()
    cp.wait()
    acc = jnp.zeros(y_ref.shape[1:], jnp.float32)
    for t in range(ksize * ksize):
        dx, dy = divmod(t, ksize)
        win = scratch[:, dx:dx + tile, dy:dy + width]
        acc += w_ref[0, t][None].astype(jnp.float32) * \
            win.astype(jnp.float32)
    y_ref[0] = acc.astype(y_ref.dtype)


def _fwd_call(x: jnp.ndarray, w: jnp.ndarray,
              interpret: bool = False) -> jnp.ndarray:
    b, h, wd, c = x.shape
    ksq = w.shape[-1]
    k = int(round(math.sqrt(ksq)))
    pad = k // 2
    tile = _pick_tile(h)
    row_pad, col_pad, halo, cols = _pads(h, wd, pad, tile, x.dtype)
    xp = jnp.transpose(
        jnp.pad(x, ((0, 0), row_pad, col_pad, (0, 0))),
        (0, 3, 1, 2))                                 # (B, C, H', cols)
    wt = jnp.transpose(w, (0, 3, 1, 2))               # (B, KK, H, W)

    if tile == h:
        y = pl.pallas_call(
            functools.partial(_fwd_whole, ksize=k, height=h, width=wd),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, c, h + 2 * pad, wd + 2 * pad),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, ksq, h, wd), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, c, h, wd), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, c, h, wd), x.dtype),
            interpret=interpret,
        )(xp, wt)
    else:
        y = pl.pallas_call(
            functools.partial(_fwd_tiled, ksize=k, tile=tile, width=wd,
                              halo=halo),
            grid=(b, h // tile),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, ksq, tile, wd),
                             lambda i, j: (i, 0, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, c, tile, wd),
                                   lambda i, j: (i, 0, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, c, h, wd), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((c, tile + halo, cols), xp.dtype),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(xp, wt)
    return jnp.transpose(y, (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# Backward wrt w: dW[t] = sum_c g_c * shift_t(x)_c
# ---------------------------------------------------------------------------

def _bwd_w_whole(xp_ref, g_ref, dw_ref, *, ksize: int, height: int,
                 width: int):
    g = g_ref[0].astype(jnp.float32)                  # (C, H, W)
    for t in range(ksize * ksize):
        dx, dy = divmod(t, ksize)
        win = xp_ref[0, :, dx:dx + height, dy:dy + width]
        dw_ref[0, t] = jnp.sum(g * win.astype(jnp.float32),
                               axis=0).astype(dw_ref.dtype)


def _bwd_w_tiled(xp_hbm, g_ref, dw_ref, scratch, sem, *, ksize: int,
                 tile: int, width: int, halo: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    cp = pltpu.make_async_copy(
        xp_hbm.at[i, :, pl.ds(j * tile, tile + halo), :], scratch, sem)
    cp.start()
    cp.wait()
    g = g_ref[0].astype(jnp.float32)
    for t in range(ksize * ksize):
        dx, dy = divmod(t, ksize)
        win = scratch[:, dx:dx + tile, dy:dy + width]
        dw_ref[0, t] = jnp.sum(g * win.astype(jnp.float32),
                               axis=0).astype(dw_ref.dtype)


# ---------------------------------------------------------------------------
# Backward wrt x: dX = sum_t flipped-shift_t(w_t * g)
# (with w, g zero-padded by p, pad(w_t * g) == wp_t * gp exactly)
# ---------------------------------------------------------------------------

def _bwd_x_whole(wp_ref, gp_ref, dx_ref, *, ksize: int, height: int,
                 width: int):
    pad = ksize // 2
    gp = gp_ref[0].astype(jnp.float32)                # (C, H+2p, W+2p)
    acc = jnp.zeros(dx_ref.shape[1:], jnp.float32)
    for t in range(ksize * ksize):
        dx, dy = divmod(t, ksize)
        fx, fy = 2 * pad - dx, 2 * pad - dy
        prod = wp_ref[0, t][None].astype(jnp.float32) * gp
        acc += prod[:, fx:fx + height, fy:fy + width]
    dx_ref[0] = acc.astype(dx_ref.dtype)


def _bwd_x_tiled(wp_hbm, gp_hbm, dx_ref, w_scratch, g_scratch, w_sem,
                 g_sem, *, ksize: int, tile: int, width: int, halo: int):
    i = pl.program_id(0)
    j = pl.program_id(1)
    pad = ksize // 2
    rows = pl.ds(j * tile, tile + halo)
    cp_w = pltpu.make_async_copy(wp_hbm.at[i, :, rows, :], w_scratch,
                                 w_sem)
    cp_g = pltpu.make_async_copy(gp_hbm.at[i, :, rows, :], g_scratch,
                                 g_sem)
    cp_w.start()
    cp_g.start()
    cp_w.wait()
    cp_g.wait()
    gp = g_scratch[...].astype(jnp.float32)
    acc = jnp.zeros(dx_ref.shape[1:], jnp.float32)
    for t in range(ksize * ksize):
        dx, dy = divmod(t, ksize)
        fx, fy = 2 * pad - dx, 2 * pad - dy
        prod = w_scratch[t][None].astype(jnp.float32) * gp
        acc += prod[:, fx:fx + tile, fy:fy + width]
    dx_ref[0] = acc.astype(dx_ref.dtype)


def _bwd_call(x: jnp.ndarray, w: jnp.ndarray, g: jnp.ndarray,
              interpret: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b, h, wd, c = x.shape
    ksq = w.shape[-1]
    k = int(round(math.sqrt(ksq)))
    pad = k // 2
    tile = _pick_tile(h)
    row_pad, col_pad, halo, cols = _pads(h, wd, pad, tile, x.dtype)

    xp = jnp.transpose(
        jnp.pad(x, ((0, 0), row_pad, col_pad, (0, 0))),
        (0, 3, 1, 2))                                 # (B, C, H', cols)
    gt = jnp.transpose(g, (0, 3, 1, 2))               # (B, C, H, W)

    # --- dW ---------------------------------------------------------------
    if tile == h:
        dwt = pl.pallas_call(
            functools.partial(_bwd_w_whole, ksize=k, height=h, width=wd),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, c, h + 2 * pad, wd + 2 * pad),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c, h, wd), lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, ksq, h, wd),
                                   lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, ksq, h, wd), w.dtype),
            interpret=interpret,
        )(xp, gt)
    else:
        dwt = pl.pallas_call(
            functools.partial(_bwd_w_tiled, ksize=k, tile=tile, width=wd,
                              halo=halo),
            grid=(b, h // tile),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec((1, c, tile, wd), lambda i, j: (i, 0, j, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, ksq, tile, wd),
                                   lambda i, j: (i, 0, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, ksq, h, wd), w.dtype),
            scratch_shapes=[
                pltpu.VMEM((c, tile + halo, cols), xp.dtype),
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(xp, gt)
    dw = jnp.transpose(dwt, (0, 2, 3, 1))

    # --- dX ---------------------------------------------------------------
    wp = jnp.transpose(
        jnp.pad(w, ((0, 0), row_pad, col_pad, (0, 0))),
        (0, 3, 1, 2))                                 # (B, KK, H', cols)
    gp = jnp.transpose(
        jnp.pad(g, ((0, 0), row_pad, col_pad, (0, 0))),
        (0, 3, 1, 2))                                 # (B, C, H', cols)
    if tile == h:
        dxt = pl.pallas_call(
            functools.partial(_bwd_x_whole, ksize=k, height=h, width=wd),
            grid=(b,),
            in_specs=[
                pl.BlockSpec((1, ksq, h + 2 * pad, wd + 2 * pad),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, c, h + 2 * pad, wd + 2 * pad),
                             lambda i: (i, 0, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, c, h, wd), lambda i: (i, 0, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, c, h, wd), x.dtype),
            interpret=interpret,
        )(wp, gp)
    else:
        dxt = pl.pallas_call(
            functools.partial(_bwd_x_tiled, ksize=k, tile=tile, width=wd,
                              halo=halo),
            grid=(b, h // tile),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((1, c, tile, wd),
                                   lambda i, j: (i, 0, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, c, h, wd), x.dtype),
            scratch_shapes=[
                pltpu.VMEM((ksq, tile + halo, cols), wp.dtype),
                pltpu.VMEM((c, tile + halo, cols), gp.dtype),
                pltpu.SemaphoreType.DMA,
                pltpu.SemaphoreType.DMA,
            ],
            interpret=interpret,
        )(wp, gp)
    dx = jnp.transpose(dxt, (0, 2, 3, 1))
    return dx, dw


# ---------------------------------------------------------------------------
# GSPMD partitioning: the op is embarrassingly parallel over the batch
# ---------------------------------------------------------------------------
#
# A Mosaic pallas_call has no built-in SPMD partitioning rule: under GSPMD
# a sharded operand reaching the custom call is ALL-GATHERED and the kernel
# runs on the full global batch on every device (verified on an 8-device
# mesh — correct values, zero parallelism). Since the kernel's grid is
# per-sample, we register a `custom_partitioning` rule that keeps the
# batch axis sharded (each device runs the kernel on its local rows) and
# replicates the spatial axes (the K//2 halo makes H/W shards
# non-local — a height-sharded operand, e.g. under spatial_parallel, is
# gathered over the model axis only, which GSPMD inserts automatically
# from the arg shardings below).

def _batch_partition_spec(arg_infos):
    """The mesh-axis assignment of dim 0 from the first operand that has
    one (None = replicated batch)."""
    for a in arg_infos:
        sharding = getattr(a, "sharding", None)
        if sharding is None:
            continue
        spec = sharding.spec
        if len(spec) and spec[0] is not None:
            return spec[0]
    return None


def _batch_only(mesh, batch_axes, ndim):
    from jax.sharding import NamedSharding, PartitionSpec

    return NamedSharding(
        mesh, PartitionSpec(*([batch_axes] + [None] * (ndim - 1))))


def _infer_fwd(interpret, mesh, arg_infos, result_infos):
    del interpret, result_infos
    return _batch_only(mesh, _batch_partition_spec(arg_infos), 4)


def _partition_fwd(interpret, mesh, arg_infos, result_infos):
    del result_infos
    b = _batch_partition_spec(arg_infos)
    arg_sh = tuple(_batch_only(mesh, b, 4) for _ in arg_infos)

    def lower(x, w):
        return _fwd_call(x, w, interpret)

    return mesh, lower, _batch_only(mesh, b, 4), arg_sh


def _infer_bwd(interpret, mesh, arg_infos, result_infos):
    del interpret, result_infos
    b = _batch_partition_spec(arg_infos)
    return (_batch_only(mesh, b, 4), _batch_only(mesh, b, 4))


def _partition_bwd(interpret, mesh, arg_infos, result_infos):
    del result_infos
    b = _batch_partition_spec(arg_infos)
    arg_sh = tuple(_batch_only(mesh, b, 4) for _ in arg_infos)

    def lower(x, w, g):
        return _bwd_call(x, w, g, interpret)

    return mesh, lower, (_batch_only(mesh, b, 4), _batch_only(mesh, b, 4)
                         ), arg_sh


from jax.experimental.custom_partitioning import custom_partitioning  # noqa: E402

_fwd_sharded = custom_partitioning(_fwd_call, static_argnums=(2,))
# Shardy propagation rule: only the batch factor is shared between
# operands and results — per-tensor spatial/channel factors keep Shardy
# from propagating a (halo-breaking) H/W sharding through the op; the
# partition callback then forces those dims replicated.
_fwd_sharded.def_partition(
    infer_sharding_from_operands=_infer_fwd,
    partition=_partition_fwd,
    sharding_rule="b i1 j1 c1, b i2 j2 k1 -> b i3 j3 c2",
)

_bwd_sharded = custom_partitioning(_bwd_call, static_argnums=(3,))
_bwd_sharded.def_partition(
    infer_sharding_from_operands=_infer_bwd,
    partition=_partition_bwd,
    sharding_rule=("b i1 j1 c1, b i2 j2 k1, b i3 j3 c2 "
                   "-> b i4 j4 c3, b i5 j5 k2"),
)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def local_kernel_apply(x: jnp.ndarray, w: jnp.ndarray,
                       interpret: bool = False) -> jnp.ndarray:
    """y[b,h,w,c] = sum_t W[b,h,w,t] * shift_t(x)[b,h,w,c].

    x: (B, H, W, C); w: (B, H, W, K*K) per-pixel kernels (any
    normalization is the caller's job). Differentiable in x and w.
    Partitions over the batch under GSPMD (see the rules above); spatial
    shardings are gathered around the op.
    """
    return _fwd_sharded(x, w, interpret)


def _vjp_fwd(x, w, interpret):
    return _fwd_sharded(x, w, interpret), (x, w)


def _vjp_bwd(interpret, res, g):
    x, w = res
    dx, dw = _bwd_sharded(x, w, g, interpret)
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
