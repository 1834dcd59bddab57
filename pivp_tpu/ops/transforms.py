"""Motion-transformation primitives for the CDNA / DNA / STP heads and the
mask compositor.

TPU-first design notes
----------------------
The reference applies per-sample CDNA kernels by permuting batch into the
channel axis and calling a depthwise conv
(/root/reference/src/models/train_model.py:331-347) — a trick that maps
poorly onto XLA's `feature_group_count` convention. Here both CDNA and DNA
are expressed over a *shifted stack*: the K*K zero-padded spatial shifts of
the previous frame, contracted against the predicted kernels with one
batched matmul (MXU-friendly, and the backward pass is another matmul).
CDNA:  out[b,m,h,w,c] = sum_k  kern[b,m,k]    * shifted[b,k,h,w,c]
DNA:   out[b,h,w,c]   = sum_k  kern[b,h,w,k]  * shifted[b,k,h,w,c]

The shifted stack realizes the true cross-correlation windows
`padded[:, dx:dx+H, dy:dy+W]`. (The reference's DNA path re-pads the
bottom/right borders with zeros after slicing — train_model.py:395-405 — a
port bug that drops up to K-1 rows/cols of real content; its CDNA path and
the original TF code use the true windows, which is what we implement.)
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from pivp_tpu.config import DNA_KERN_SIZE, RELU_SHIFT


# ---------------------------------------------------------------------------
# Shifted stack
# ---------------------------------------------------------------------------

def shifted_stack(image: jnp.ndarray, ksize: int = DNA_KERN_SIZE,
                  border_zero: bool = False) -> jnp.ndarray:
    """(B, H, W, C) -> (B, K*K, H, W, C) of zero-padded spatial shifts.

    Index k = dx*K + dy corresponds to the cross-correlation tap
    padded[h+dx, w+dy] with pad = K//2 (row-major over (dx, dy), matching
    the reference's kernel flattening order at train_model.py:326 and its
    DNA double loop at train_model.py:397-398).

    `border_zero=True` reproduces the Chainer port's DNA slicing bug
    (train_model.py:395-405): each shift takes padded[dx:H, dy:W] — ending
    at the *unshifted* size — and re-pads the bottom/right tail with
    zeros, so the last dx rows / dy cols of every shifted copy are zero.
    """
    pad = ksize // 2
    b, h, w, c = image.shape
    padded = jnp.pad(image, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    if border_zero:
        shifts = [
            jnp.pad(jax.lax.slice(padded, (0, dx, dy, 0), (b, h, w, c)),
                    ((0, 0), (0, dx), (0, dy), (0, 0)))
            for dx in range(ksize) for dy in range(ksize)
        ]
    else:
        shifts = [
            jax.lax.slice(padded, (0, dx, dy, 0), (b, dx + h, dy + w, c))
            for dx in range(ksize) for dy in range(ksize)
        ]
    return jnp.stack(shifts, axis=1)


def mask_softmax(mask_logits: jnp.ndarray,
                 scramble: bool = False) -> jnp.ndarray:
    """ReLU + softmax of the compositing mask logits (B, H, W, M+1).

    `scramble=False` (default): per-pixel softmax over the M+1 mask
    channels — the original TF semantics.
    `scramble=True`: bit-exact reproduction of the Chainer port's
    reshape(-1, M+1) softmax over the *NCHW* tensor
    (train_model.py:720-722), which groups runs of M+1 consecutive
    row-major NCHW elements instead of per-pixel channels.
    """
    if not scramble:
        return jax.nn.softmax(jax.nn.relu(mask_logits), axis=-1)
    b, h, w, m1 = mask_logits.shape
    x = jax.nn.relu(mask_logits)
    x = jnp.transpose(x, (0, 3, 1, 2)).reshape(-1, m1)   # NCHW row-major
    x = jax.nn.softmax(x, axis=-1)
    x = x.reshape(b, m1, h, w)
    return jnp.transpose(x, (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# CDNA
# ---------------------------------------------------------------------------

def normalize_cdna_kernels(raw: jnp.ndarray,
                           relu_shift: float = RELU_SHIFT) -> jnp.ndarray:
    """ReLU-shift + sum-normalize raw kernel logits to probability kernels.

    raw: (B, M, K*K) flattened kernels from the linear head.
    Reference: train_model.py:326-329.
    """
    k = jax.nn.relu(raw - relu_shift) + relu_shift
    norm = jnp.sum(k, axis=-1, keepdims=True)
    return k / norm


def cdna_apply(prev_image: jnp.ndarray, kernels: jnp.ndarray) -> jnp.ndarray:
    """Apply per-sample CDNA kernels to the previous frame.

    prev_image: (B, H, W, C); kernels: (B, M, K*K), already normalized.
    Returns (B, M, H, W, C) — one transformed frame per mask.

    Equivalent to the reference's batch<->channel-swapped depthwise conv
    (train_model.py:331-347), formulated as a single batched matmul
    (B, M, KK) @ (B, KK, H*W*C).
    """
    b, h, w, c = prev_image.shape
    ksq = kernels.shape[-1]
    ksize = int(round(ksq ** 0.5))
    stack = shifted_stack(prev_image, ksize)            # (B, KK, H, W, C)
    stack2 = stack.reshape(b, ksq, h * w * c)
    out = jax.lax.dot_general(
        kernels.astype(prev_image.dtype), stack2,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=prev_image.dtype,
    )                                                   # (B, M, H*W*C)
    return out.reshape(b, kernels.shape[1], h, w, c)


def fused_cdna_composite(prev_image: jnp.ndarray, synth: jnp.ndarray,
                         kernels: jnp.ndarray, mask_logits: jnp.ndarray,
                         local_apply=None,
                         scramble: bool = False) -> jnp.ndarray:
    """CDNA transform + mask compositing in one pass, never materializing
    the (B, M, H, W, C) per-mask transformed stack.

    Algebraic identity: with masks m_0..m_M (per-pixel softmax) and CDNA
    kernels k_0..k_{M-2} (the compositor's zip truncation uses only the
    first num_masks candidates = synth + M-1 CDNA transforms;
    train_model.py:726-727),

        out = prev*m_0 + synth*m_1 + sum_j (k_j (*) prev) * m_{j+2}
            = prev*m_0 + synth*m_1 + sum_t w_t * shift_t(prev),
        w[b,h,w,t] = sum_j masks[b,h,w,j+2] * kernels[b,j,t]

    i.e. the masked CDNA mixture collapses to ONE per-pixel (DNA-style)
    kernel w computed by a (HW, M-1) @ (M-1, K*K) MXU matmul per sample.
    HBM traffic drops from O(B*M*HWC) to O(B*HW*K^2).

    Args:
      prev_image: (B, H, W, C); synth: (B, H, W, C) sigmoid(enc7);
      kernels: (B, M, K*K) normalized; mask_logits: (B, H, W, M+1).
      local_apply: optional override for the per-pixel K*K tap application
        (e.g. the Pallas kernel); defaults to the shifted-stack einsum.
      scramble: reproduce the Chainer port's mask-softmax scramble
        (see mask_softmax).
    """
    masks = mask_softmax(mask_logits, scramble)
    m = kernels.shape[1]
    # Per-pixel combined kernel from the M-1 used CDNA kernels.
    w = jnp.einsum("bhwm,bmk->bhwk", masks[..., 2:].astype(kernels.dtype),
                   kernels[:, :m - 1])
    out = prev_image * masks[..., 0:1] + synth * masks[..., 1:2]
    if local_apply is None:
        ksq = w.shape[-1]
        ksize = int(round(ksq ** 0.5))
        stack = shifted_stack(prev_image, ksize)
        out = out + jnp.einsum("bkhwc,bhwk->bhwc", stack,
                               w.astype(stack.dtype))
    else:
        out = out + local_apply(prev_image, w)
    return out


# ---------------------------------------------------------------------------
# DNA
# ---------------------------------------------------------------------------

def dna_apply(prev_image: jnp.ndarray, kernel_logits: jnp.ndarray,
              relu_shift: float = RELU_SHIFT,
              local_apply=None, border_zero: bool = False) -> jnp.ndarray:
    """Dynamic neural advection: per-pixel K*K kernels.

    prev_image: (B, H, W, C); kernel_logits: (B, H, W, K*K) (the enc7
    output). Normalizes over the K*K axis (reference train_model.py:408-410)
    and computes the per-pixel expectation over the shifted stack
    (train_model.py:411-414). `local_apply` optionally overrides the tap
    application (e.g. the Pallas kernel). `border_zero=True` reproduces
    the Chainer port's shift-window bug (see shifted_stack); it is
    incompatible with `local_apply`, which computes true windows.
    """
    ksq = kernel_logits.shape[-1]
    ksize = int(round(ksq ** 0.5))
    kern = jax.nn.relu(kernel_logits - relu_shift) + relu_shift
    kern = kern / jnp.sum(kern, axis=-1, keepdims=True)
    if local_apply is not None and not border_zero:
        return local_apply(prev_image, kern.astype(prev_image.dtype))
    stack = shifted_stack(prev_image, ksize, border_zero=border_zero)
    return jnp.einsum("bkhwc,bhwk->bhwc", stack, kern.astype(stack.dtype))


# ---------------------------------------------------------------------------
# STP — affine spatial transformer
# ---------------------------------------------------------------------------

def affine_grid(theta: jnp.ndarray, size: Tuple[int, int]) -> jnp.ndarray:
    """Build a normalized sampling grid from affine params.

    theta: (..., 2, 3); size: (H, W). Returns (..., H, W, 2) of (x, y)
    source coordinates in [-1, 1], align-corners convention — semantics
    of chainer `F.spatial_transformer_grid` used at train_model.py:469.
    Leading batch dims (e.g. a per-mask axis) are supported.
    """
    h, w = size
    ys = jnp.linspace(-1.0, 1.0, h, dtype=theta.dtype)
    xs = jnp.linspace(-1.0, 1.0, w, dtype=theta.dtype)
    grid_y, grid_x = jnp.meshgrid(ys, xs, indexing="ij")   # (H, W)
    ones = jnp.ones_like(grid_x)
    base = jnp.stack([grid_x, grid_y, ones], axis=-1)      # (H, W, 3)
    return jnp.einsum("...ij,hwj->...hwi", theta, base)    # (..., H, W, 2)


def bilinear_sample(image: jnp.ndarray, grid: jnp.ndarray) -> jnp.ndarray:
    """Bilinear sampling with zero padding outside the image.

    image: (B, H, W, C); grid: (B, ..., 2) normalized (x, y) coords —
    extra leading grid dims (e.g. a per-mask warp axis) are sampled in
    ONE batched gather, which is what makes the multi-warp STP head fast
    on TPU (one 4-tap gather per call instead of one per mask).
    Matches chainer `F.spatial_transformer_sampler` (train_model.py:470).
    """
    b, h, w, c = image.shape
    gx = (grid[..., 0] + 1.0) * (w - 1) / 2.0
    gy = (grid[..., 1] + 1.0) * (h - 1) / 2.0

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    x1 = x0 + 1.0
    y1 = y0 + 1.0

    wx1 = gx - x0
    wx0 = 1.0 - wx1
    wy1 = gy - y0
    wy0 = 1.0 - wy1

    def gather(yi, xi, wgt):
        # Zero weight for out-of-bounds taps (zero-padding semantics).
        valid = ((yi >= 0) & (yi <= h - 1) & (xi >= 0) & (xi <= w - 1))
        yc = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        xc = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        flat = yc * w + xc                                  # (B, H', W')
        img_flat = image.reshape(b, h * w, c)
        vals = jnp.take_along_axis(
            img_flat, flat.reshape(b, -1, 1), axis=1
        ).reshape(flat.shape + (c,))
        return vals * (wgt * valid.astype(image.dtype))[..., None]

    out = (gather(y0, x0, wy0 * wx0) + gather(y0, x1, wy0 * wx1)
           + gather(y1, x0, wy1 * wx0) + gather(y1, x1, wy1 * wx1))
    return out


def bilinear_sample_matmul(image: jnp.ndarray,
                           grid: jnp.ndarray) -> jnp.ndarray:
    """Gather-free bilinear sampling: fold the interpolation weights into
    one-hot row/column selector matrices and sample with one batched
    matmul + a row-wise contraction — TPUs execute gathers poorly but
    matmuls at full MXU rate.

    For output pixel p with source (gy, gx): R[p, y] carries the y-axis
    weights (nonzero only at floor(gy) and floor(gy)+1), C[p, w] the
    x-axis weights; out[p] = sum_w C[p, w] * (R @ image)[p, w]. Out-of-
    range taps get zero weight automatically (the equality never fires),
    matching the zero-padding semantics of `bilinear_sample`.

    image: (B, H, W, C); grid: (B, ..., 2) normalized coords.
    """
    b, h, w, c = image.shape
    lead = grid.shape[1:-1]
    gx = (grid[..., 0].reshape(b, -1) + 1.0) * (w - 1) / 2.0  # (B, P)
    gy = (grid[..., 1].reshape(b, -1) + 1.0) * (h - 1) / 2.0

    x0 = jnp.floor(gx)
    y0 = jnp.floor(gy)
    wx1 = (gx - x0)[..., None]
    wy1 = (gy - y0)[..., None]

    ys = jnp.arange(h, dtype=image.dtype)
    xs = jnp.arange(w, dtype=image.dtype)
    r = (jnp.where(ys == y0[..., None], 1.0 - wy1, 0.0)
         + jnp.where(ys == y0[..., None] + 1.0, wy1, 0.0))  # (B, P, H)
    col = (jnp.where(xs == x0[..., None], 1.0 - wx1, 0.0)
           + jnp.where(xs == x0[..., None] + 1.0, wx1, 0.0))  # (B, P, W)

    rows = jnp.einsum("bph,bhwc->bpwc", r.astype(image.dtype), image)
    out = jnp.einsum("bpw,bpwc->bpc", col.astype(image.dtype), rows)
    return out.reshape((b,) + lead + (c,))


def stp_apply(prev_image: jnp.ndarray, theta: jnp.ndarray,
              use_matmul: bool = True) -> jnp.ndarray:
    """Warp prev_image by affine params theta (B, 2, 3) — or by a stack
    of per-mask params (B, M, 2, 3), returning (B, M, H, W, C).

    `use_matmul=True` uses the MXU one-hot formulation
    (bilinear_sample_matmul); False uses the gather-based sampler.
    """
    grid = affine_grid(theta.astype(prev_image.dtype),
                       prev_image.shape[1:3])
    if use_matmul:
        return bilinear_sample_matmul(prev_image, grid)
    return bilinear_sample(prev_image, grid)


# ---------------------------------------------------------------------------
# Mask compositing
# ---------------------------------------------------------------------------

def mask_composite(prev_image: jnp.ndarray, transformed: jnp.ndarray,
                   mask_logits: jnp.ndarray,
                   scramble: bool = False
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Softmax the masks per pixel and composite the candidates.

    prev_image: (B, H, W, C); transformed: (B, M, H, W, C);
    mask_logits: (B, H, W, M+1) from the masks head.
    Returns (output (B, H, W, C), masks (B, H, W, M+1)).

    Semantics follow the original NHWC TF model: relu, then per-pixel
    softmax over the M+1 mask channels, then
    output = prev*mask0 + sum_m transformed_m * mask_{m+1}
    (reference train_model.py:717-728; `scramble=True` reproduces the
    Chainer port's reshape(-1, M+1) softmax on the NCHW tensor — see
    mask_softmax — for bit-honest parity with reference checkpoints).
    """
    masks = mask_softmax(mask_logits, scramble)
    out = prev_image * masks[..., 0:1]
    out = out + jnp.einsum("bmhwc,bhwm->bhwc", transformed,
                           masks[..., 1:].astype(transformed.dtype))
    return out, masks


# ---------------------------------------------------------------------------
# Frame quantization (the uint8 wire/storage format)
# ---------------------------------------------------------------------------

def quantize_frames_u8(frames: jnp.ndarray) -> jnp.ndarray:
    """[0,1] float frames -> uint8 with round-half-up and clipping.

    THE one definition of the uint8 frame format, shared by the serving
    export (inference/export.py), the inference benchmark, and mirrored
    by the host-side numpy quantizer in training/loop.py (u8_transfer) —
    keep them in lockstep so artifacts and benchmarks measure identical
    pixel values."""
    return jnp.clip(frames.astype(jnp.float32) * 255.0 + 0.5,
                    0.0, 255.0).astype(jnp.uint8)
