"""Fused K-dispatch batch assembly for the training input pipeline.

The training loop dispatches K optimizer steps per device call
(TrainConfig.steps_per_call), so the host must assemble K batches —
gather shuffled sequences, transpose to time-major, optionally quantize
frames to uint8 for the transfer — per dispatch. Done with numpy
primitives that is ~4 full passes over the payload (gather, swapaxes +
ascontiguousarray, np.stack, quantize), the measured cause of periodic
multi-second epoch refill stalls on 1-core hosts (BENCHMARKS.md "Input
pipeline").

`assemble_calls` does it in one pass through the native C++ routine
(native/batch_assembler.cc via data/native.py) when the image store is a
plain contiguous float32 ndarray, and falls back to an equivalent numpy
path (bit-identical output, exercised by tests/test_native_assembler.py)
for lazy/mmap-backed stores or when no toolchain is available.

Collation contract: concat_examples' time-major stacking
(/root/reference/src/models/train_model.py:51-71), K-stacked.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from pivp_tpu.data import native

Arrays = Tuple[np.ndarray, np.ndarray, np.ndarray]


def _time_major_gather(src, idx: np.ndarray) -> np.ndarray:
    """src[(K,B) idx] -> (K, T, B, ...), contiguous. Works for ndarrays
    and for LazySequences-style stores (1-D integer gather only)."""
    k, b = idx.shape
    g = np.asarray(src[idx.reshape(-1)])          # (K*B, T, ...)
    g = g.reshape(k, b, *g.shape[1:])
    return np.ascontiguousarray(np.swapaxes(g, 1, 2))


def _quantize_u8(images: np.ndarray) -> np.ndarray:
    """Mirror of training/loop.py _quantize_images (and of the native
    routine): clip(x*255+0.5, 0, 255) in f32 then truncate to uint8."""
    return np.clip(images * 255.0 + 0.5, 0.0, 255.0).astype(np.uint8)


def _native_images(images: np.ndarray, idx: np.ndarray,
                   quantize: bool) -> np.ndarray:
    lib = native.get_assembler_lib()
    k, b = idx.shape
    t = images.shape[1]
    row = int(np.prod(images.shape[2:]))
    out = np.empty((k, t, b) + images.shape[2:],
                   np.uint8 if quantize else np.float32)
    idx = np.ascontiguousarray(idx.reshape(-1), np.int64)
    fn = lib.pivp_assemble_u8 if quantize else lib.pivp_assemble_f32
    fn(images.ctypes.data, idx.ctypes.data, k, b, t, row,
       out.ctypes.data)
    return out


def _native_ok(images) -> bool:
    return (native.get_assembler_lib() is not None
            and isinstance(images, np.ndarray)
            and images.dtype == np.float32
            and images.flags["C_CONTIGUOUS"]
            and images.ndim >= 3)


def assemble_calls(arrays: Arrays, idx: np.ndarray,
                   quantize: bool) -> Arrays:
    """Assemble a K-step dispatch payload from sequence indices.

    arrays: (images (N,T,H,W,C) f32 | lazy store, actions (N,T,A),
    states (N,T,S)); idx: (K, B) int64 sequence indices.
    Returns (images (K,T,B,H,W,C) u8-if-quantize-else-f32,
    actions (K,T,B,A) f32, states (K,T,B,S) f32) — exactly the payload
    the numpy np.stack-of-batches path produced.
    """
    images, actions, states = arrays
    if _native_ok(images):
        imgs = _native_images(images, idx, quantize)
    else:
        imgs = _time_major_gather(images, idx)
        if quantize:
            imgs = _quantize_u8(imgs)
    return (imgs,
            _time_major_gather(actions, idx),
            _time_major_gather(states, idx))
