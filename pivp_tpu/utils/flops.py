"""Analytic FLOP count for the predictor train step.

XLA's cost_analysis() under-reports conv FLOPs enormously on some plugin
backends (observed ~300x low through remote-attached runtimes), so the
benchmark MFU numbers use this hand count instead. Counts multiply-adds
as 2 FLOPs; a backward pass is the standard 2x forward (grad wrt inputs +
grad wrt filters), so one optimizer step = 3x forward.
"""

from __future__ import annotations

from pivp_tpu.config import ModelConfig

# The benchmark hardware target: TPU v5e bf16 peak. Every benchmark MFU
# column (bench.py, tools/bench_serving.py, ...) divides by this ONE
# constant so a hardware-target change can't desynchronize them.
V5E_BF16_PEAK_TFLOPS = 197.0

# Reference default mask counts per head (train_model.py:786 num_masks=10;
# DNA asserts num_masks==1 at :389-390). Shared by the benchmark tools so
# their model tables can't drift.
DEFAULT_NUM_MASKS = {"CDNA": 10, "DNA": 1, "STP": 10}


def mfu(achieved_tflops: float) -> float:
    """Fraction of v5e bf16 peak that `achieved_tflops` represents."""
    return achieved_tflops / V5E_BF16_PEAK_TFLOPS


def _conv(out_hw: int, ksize: int, c_in: int, c_out: int) -> int:
    return out_hw * ksize * ksize * c_in * c_out * 2


def forward_step_flops(cfg: ModelConfig) -> int:
    """Conv/matmul FLOPs for ONE timestep of the trunk + head, per sample.
    Mirrors the stage structure of predictor.forward_step (channel plan
    from reference train_model.py:500-529)."""
    h, w = cfg.image_height, cfg.image_width
    r0, r1, r2, r3 = h * w, (h // 2) * (w // 2), (h // 4) * (w // 4), \
        (h // 8) * (w // 8)
    ec = cfg.enc_channels
    lc = cfg.lstm_channels
    c = cfg.color_channels
    sa = (cfg.action_dim + cfg.state_dim) if cfg.use_state else 0
    k2 = cfg.dna_kern_size ** 2

    f = 0
    f += _conv(r1, 5, c, ec[0])                       # enc0
    f += _conv(r1, 5, ec[0] + lc[0], 4 * lc[0])       # lstm1
    f += _conv(r1, 5, lc[0] + lc[1], 4 * lc[1])       # lstm2
    f += _conv(r2, 3, lc[1], ec[1])                   # enc1
    f += _conv(r2, 5, ec[1] + lc[2], 4 * lc[2])       # lstm3
    f += _conv(r2, 5, lc[2] + lc[3], 4 * lc[3])       # lstm4
    f += _conv(r3, 3, lc[3], ec[2])                   # enc2
    f += _conv(r3, 1, ec[2] + sa, ec[3])              # enc3
    f += _conv(r3, 5, ec[3] + lc[4], 4 * lc[4])       # lstm5
    f += _conv(r2, 3, lc[4], ec[4])                   # enc4 (deconv)
    f += _conv(r2, 5, ec[4] + lc[5], 4 * lc[5])       # lstm6
    f += _conv(r1, 3, lc[5] + ec[1], ec[5])           # enc5 (deconv)
    f += _conv(r1, 5, ec[5] + lc[6], 4 * lc[6])       # lstm7
    f += _conv(r0, 3, lc[6] + ec[0], ec[6])           # enc6 (deconv)
    f += _conv(r0, 1, ec[6], cfg.num_masks + 1)       # masks
    hidden5_dim = r3 * lc[4]
    if cfg.is_cdna:
        f += _conv(r0, 1, ec[6], c)                   # enc7
        f += hidden5_dim * k2 * cfg.num_masks * 2     # cdna_kerns linear
        f += r0 * k2 * c * 2                          # local kernel apply
    elif cfg.is_dna:
        f += _conv(r0, 1, ec[6], k2)                  # enc7
        f += r0 * k2 * c * 2
    else:                                             # STP
        f += _conv(r0, 1, ec[6], c)
        f += hidden5_dim * 100 * 2 + 100 * 6 * 2
        n_warps = 1 if cfg.stp_shared_params else cfg.num_masks - 1
        f += n_warps * r0 * c * 8                     # 4-tap bilinear
    f += sa * cfg.state_dim * 2                       # state predictor
    return f


def train_step_flops(cfg: ModelConfig, batch: int,
                     remat: bool = False) -> int:
    """FLOPs for one optimizer step: (T-1) timesteps x batch x 3x forward
    (4x with per-step remat, which recomputes the forward in backward)."""
    mult = 4 if remat else 3
    return forward_step_flops(cfg) * (cfg.sequence_length - 1) * batch \
        * mult
