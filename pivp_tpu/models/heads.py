"""Transformation heads: CDNA, DNA, STP.

Functional re-designs of the reference's StatelessCDNA / StatelessDNA /
StatelessSTP chains (/root/reference/src/models/train_model.py:278-475).
Each head takes the trunk outputs and the previous frame and returns a
stack of candidate transformed frames (B, n_cand, H, W, C) plus the enc7
activation (kept for activation visualization, mirroring conv_res).

Candidate counts (compositor pairs them with masks 1..num_masks and, like
both the reference and the original TF model, silently drops extras via
zip truncation — train_model.py:726-727):
  * CDNA: 1 + num_masks (synthesized frame + per-mask kernels; the last
    kernel's output is dropped by the compositor).
  * DNA: 1 (num_masks must be 1).
  * STP: num_masks (synthesized frame + num_masks-1 affine warps).
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from pivp_tpu.config import ModelConfig
from pivp_tpu.ops import layers, transforms

Params = Dict[str, jnp.ndarray]


# ---------------------------------------------------------------------------
# CDNA — convolutional dynamic neural advection (train_model.py:278-351)
# ---------------------------------------------------------------------------

def cdna_head_init(key, cfg: ModelConfig, hidden5_dim: int) -> Params:
    k_enc, k_lin = jax.random.split(key)
    ksq = cfg.dna_kern_size ** 2
    return {
        # Deconv 1x1 stride 1 == pointwise conv (train_model.py:288).
        "enc7": layers.deconv2d_init(k_enc, cfg.enc_channels[6],
                                     cfg.color_channels, 1),
        # Linear(hidden5_flat -> K*K*num_masks) (train_model.py:289).
        "cdna_kerns": layers.dense_init(k_lin, hidden5_dim,
                                        ksq * cfg.num_masks),
    }


def cdna_head_parts(params: Params, cfg: ModelConfig, enc6: jnp.ndarray,
                    hidden5: jnp.ndarray, enc7_raw=None
                    ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shared CDNA computations: synthesized frame + normalized kernels.
    Returns (synth (B,H,W,C), kerns (B,M,K*K), enc7).

    `enc7_raw`, when given, is the pre-activation enc7 already computed
    by the trunk's merged masks+enc7 conv (ModelConfig.merge_output_convs)
    and replaces the head's own deconv."""
    b = enc6.shape[0]
    if enc7_raw is None:
        enc7_raw = layers.deconv2d(params["enc7"], enc6, stride=1,
                                   padding=0,
                                   as_matmul=cfg.one_by_one_matmul)
    enc7 = jax.nn.relu(enc7_raw)
    synth = jax.nn.sigmoid(enc7)
    raw = layers.dense(params["cdna_kerns"], hidden5.reshape(b, -1))
    raw = raw.reshape(b, cfg.num_masks, cfg.dna_kern_size ** 2)
    kerns = transforms.normalize_cdna_kernels(raw, cfg.relu_shift)
    return synth, kerns, enc7


def cdna_head(params: Params, cfg: ModelConfig, enc6: jnp.ndarray,
              hidden5: jnp.ndarray, prev_image: jnp.ndarray,
              enc7_raw=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    synth, kerns, enc7 = cdna_head_parts(params, cfg, enc6, hidden5,
                                         enc7_raw)
    moved = transforms.cdna_apply(prev_image, kerns)   # (B, M, H, W, C)
    candidates = jnp.concatenate([synth[:, None], moved], axis=1)
    return candidates, enc7


# ---------------------------------------------------------------------------
# DNA — per-pixel dynamic neural advection (train_model.py:354-417)
# ---------------------------------------------------------------------------

def dna_head_init(key, cfg: ModelConfig, hidden5_dim: int) -> Params:
    del hidden5_dim
    return {
        # Deconv 1x1 -> K*K channels of per-pixel kernel logits
        # (train_model.py:364).
        "enc7": layers.deconv2d_init(key, cfg.enc_channels[6],
                                     cfg.dna_kern_size ** 2, 1),
    }


def dna_head(params: Params, cfg: ModelConfig, enc6: jnp.ndarray,
             hidden5: jnp.ndarray, prev_image: jnp.ndarray,
             enc7_raw=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    del hidden5
    if enc7_raw is None:
        enc7_raw = layers.deconv2d(params["enc7"], enc6, stride=1,
                                   padding=0,
                                   as_matmul=cfg.one_by_one_matmul)
    enc7 = jax.nn.relu(enc7_raw)
    local = None
    if cfg.use_pallas and not cfg.dna_border_zero:
        from pivp_tpu.ops.pallas import local_apply as pallas_apply
        interp = cfg.pallas_interpret
        local = lambda x, w: pallas_apply.local_kernel_apply(x, w, interp)
    out = transforms.dna_apply(prev_image, enc7, cfg.relu_shift,
                               local_apply=local,
                               border_zero=cfg.dna_border_zero)
    return out[:, None], enc7                          # (B, 1, H, W, C)


# ---------------------------------------------------------------------------
# STP — affine spatial transformer predictor (train_model.py:419-475)
# ---------------------------------------------------------------------------

def stp_head_init(key, cfg: ModelConfig, hidden5_dim: int) -> Params:
    k_enc, k_fc, k_par = jax.random.split(key, 3)
    params = {
        "enc7": layers.deconv2d_init(k_enc, cfg.enc_channels[6],
                                     cfg.color_channels, 1),
        # Linear(hidden5_flat -> 100) (train_model.py:430, 457-459).
        "stp_input": layers.dense_init(k_fc, hidden5_dim, 100),
    }
    if cfg.stp_shared_params:
        # Reference quirk: one shared Linear(6) reused for every mask
        # (train_model.py:431, 465-467).
        params["identity_params"] = layers.dense_init(k_par, 100, 6)
    else:
        keys = jax.random.split(k_par, cfg.num_masks - 1)
        params["identity_params"] = [layers.dense_init(k, 100, 6)
                                     for k in keys]
    return params


def stp_head(params: Params, cfg: ModelConfig, enc6: jnp.ndarray,
             hidden5: jnp.ndarray, prev_image: jnp.ndarray,
             enc7_raw=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
    b = prev_image.shape[0]
    # No ReLU before the sigmoid here, unlike CDNA (train_model.py:454-455).
    enc7 = (layers.deconv2d(params["enc7"], enc6, stride=1, padding=0,
                            as_matmul=cfg.one_by_one_matmul)
            if enc7_raw is None else enc7_raw)
    synth = jax.nn.sigmoid(enc7)

    feat = jax.nn.relu(layers.dense(params["stp_input"],
                                    hidden5.reshape(b, -1)))
    identity = jnp.array([1.0, 0.0, 0.0, 0.0, 1.0, 0.0],
                         dtype=feat.dtype)

    if cfg.stp_shared_params:
        # One shared Linear(6) means every mask's theta — and therefore
        # every warp — is IDENTICAL (reference quirk, train_model.py:
        # 465-467). Compute the warp once and broadcast: exact by
        # construction, and removes (num_masks-2)/(num_masks-1) of the
        # head's sampling work (~90% at the default num_masks=10).
        theta = layers.dense(params["identity_params"], feat) + identity
        warp = transforms.stp_apply(prev_image, theta.reshape(b, 2, 3))
        warps = jnp.broadcast_to(warp[:, None],
                                 (b, cfg.num_masks - 1) + warp.shape[1:])
        candidates = jnp.concatenate([synth[:, None], warps], axis=1)
        return candidates, enc7

    # Per-mask warps with distinct projections. Measured on TPU v5e: 9
    # per-mask gathers (this form) run 1.65x faster than one batched
    # (B, M-1, H*W) gather (703 vs 1163 ms/step at B=32) — the big
    # gather lowers worse.
    warps = []
    for i in range(cfg.num_masks - 1):
        theta = layers.dense(params["identity_params"][i], feat) + identity
        warps.append(transforms.stp_apply(prev_image,
                                          theta.reshape(b, 2, 3)))

    candidates = jnp.stack([synth] + warps, axis=1)    # (B, M, H, W, C)
    return candidates, enc7


HEADS = {
    "CDNA": (cdna_head_init, cdna_head),
    "DNA": (dna_head_init, dna_head),
    "STP": (stp_head_init, stp_head),
}
