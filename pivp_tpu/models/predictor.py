"""Action/state-conditioned ConvLSTM video predictor (CDNA / DNA / STP).

TPU-native re-design of the reference `Model` chain
(/root/reference/src/models/train_model.py:478-764):

  * the 7-stage trunk (convs, ConvLSTMs, flattened LayerNorms, state/action
    smear, skip connections — the declarative ops table at
    train_model.py:594-602) is an explicit pure function in NHWC;
  * the per-timestep Python rollout loop (train_model.py:659-731) is ONE
    `lax.scan`, so the whole T-step unroll plus backward compiles to a
    single XLA program;
  * scheduled sampling (train_model.py:73-122, 648-670) happens on-device
    inside the scan (see ops/sampling.py);
  * parameters are a plain pytree; ConvLSTM state is an explicit scan
    carry (the reference mutates chain attributes and reset_state()s
    between iterations — here every call starts from zero state, which is
    the same semantics).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from pivp_tpu.config import ModelConfig
from pivp_tpu.models import heads
from pivp_tpu.ops import convlstm, layers, metrics, sampling, transforms

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# Parameter initialization
# ---------------------------------------------------------------------------

def _resolutions(cfg: ModelConfig) -> Tuple[Tuple[int, int], ...]:
    h, w = cfg.image_height, cfg.image_width
    return ((h, w), (h // 2, w // 2), (h // 4, w // 4), (h // 8, w // 8))


def hidden5_dim(cfg: ModelConfig) -> int:
    _, _, _, (h8, w8) = _resolutions(cfg)
    return h8 * w8 * cfg.lstm_channels[4]


def init_params(key: jax.Array, cfg: ModelConfig) -> Params:
    """Build the full parameter pytree.

    Channel plan mirrors train_model.py:500-529; static input channels are
    derived here (the reference lazily infers them on first call).
    """
    ks = jax.random.split(key, 16)
    (r0, r1, r2, r3) = _resolutions(cfg)
    ec = cfg.enc_channels      # (32, 32, 64, 64, 128, 96, 64)
    lc = cfg.lstm_channels     # (32, 32, 64, 64, 128, 64, 32)
    c = cfg.color_channels
    sa_dim = cfg.action_dim + cfg.state_dim

    enc3_in = ec[2] + (sa_dim if cfg.use_state else 0)

    params: Params = {
        # --- convolutional trunk (train_model.py:500-507) ---
        "enc0": layers.conv2d_init(ks[0], c, ec[0], 5),
        "enc1": layers.conv2d_init(ks[1], lc[1], ec[1], 3),
        "enc2": layers.conv2d_init(ks[2], lc[3], ec[2], 3),
        "enc3": layers.conv2d_init(ks[3], enc3_in, ec[3], 1),
        "enc4": layers.deconv2d_init(ks[4], lc[4], ec[4], 3),
        "enc5": layers.deconv2d_init(ks[5], lc[5] + ec[1], ec[5], 3),
        "enc6": layers.deconv2d_init(ks[6], lc[6] + ec[0], ec[6], 3),
        # --- ConvLSTM stack (train_model.py:509-515) ---
        "lstm1": convlstm.conv_lstm_init(ks[7], ec[0], lc[0]),
        "lstm2": convlstm.conv_lstm_init(ks[8], lc[0], lc[1]),
        "lstm3": convlstm.conv_lstm_init(ks[9], ec[1], lc[2]),
        "lstm4": convlstm.conv_lstm_init(ks[10], lc[2], lc[3]),
        "lstm5": convlstm.conv_lstm_init(ks[11], ec[3], lc[4]),
        "lstm6": convlstm.conv_lstm_init(ks[12], ec[4], lc[5]),
        "lstm7": convlstm.conv_lstm_init(ks[13], ec[5], lc[6]),
        # --- flattened LayerNorms (train_model.py:517-525) ---
        "norm_enc0": layers.layer_norm_flat_init((*r1, ec[0])),
        "norm_enc6": layers.layer_norm_flat_init((*r0, ec[6])),
        "hidden1": layers.layer_norm_flat_init((*r1, lc[0])),
        "hidden2": layers.layer_norm_flat_init((*r1, lc[1])),
        "hidden3": layers.layer_norm_flat_init((*r2, lc[2])),
        "hidden4": layers.layer_norm_flat_init((*r2, lc[3])),
        "hidden5": layers.layer_norm_flat_init((*r3, lc[4])),
        "hidden6": layers.layer_norm_flat_init((*r2, lc[5])),
        "hidden7": layers.layer_norm_flat_init((*r1, lc[6])),
        # --- compositing masks + state predictor (train_model.py:527-529) -
        "masks": layers.deconv2d_init(ks[14], ec[6], cfg.num_masks + 1, 1),
        "state_pred": layers.dense_init(ks[15], sa_dim, cfg.state_dim),
    }

    head_init, _ = heads.HEADS[cfg.model_type]
    params["head"] = head_init(jax.random.fold_in(key, 100), cfg,
                               hidden5_dim(cfg))
    return params


def init_lstm_states(cfg: ModelConfig, batch: int, dtype=jnp.float32):
    (r0, r1, r2, r3) = _resolutions(cfg)
    lc = cfg.lstm_channels
    res = (r1, r1, r2, r2, r3, r2, r1)
    return tuple(
        convlstm.zero_state(batch, rh, rw, ch, dtype)
        for (rh, rw), ch in zip(res, lc)
    )


# ---------------------------------------------------------------------------
# One-timestep forward
# ---------------------------------------------------------------------------

class StepOutput(NamedTuple):
    gen_image: jnp.ndarray          # (B, H, W, C)
    gen_state: jnp.ndarray          # (B, state_dim)
    encs: Optional[Tuple[jnp.ndarray, ...]]   # activations (viz) or None


def forward_step(params: Params, cfg: ModelConfig, lstm_states,
                 prev_image: jnp.ndarray, state_action: jnp.ndarray,
                 capture: bool = False):
    """Run the trunk + head + compositor for one timestep.

    Stage structure and ReLU-at-stage-end follow the reference ops table
    (train_model.py:594-602, executed at 683-700).
    """
    relu = jax.nn.relu
    fb = cfg.forget_bias
    gd = (jnp.float32 if cfg.lstm_gate_compute == "float32"
          else cfg.dtype)

    # "auto": pad only when the per-conv GEMM M dim (batch x spatial) is
    # small enough that K starvation dominates — measured win at b32,
    # loss at b64/b128 (BENCHMARKS.md round-5 note, config.py).
    pgc = cfg.pad_gate_convs
    if pgc == "auto":
        pgc = prev_image.shape[0] <= 48

    def cell(p, st, inp):
        return convlstm.conv_lstm(p, st, inp, fb, gd,
                                  pallas_gates=cfg.use_pallas_gates,
                                  pad_cin_to=(128 if pgc else 0))
    eps = cfg.layer_norm_eps
    s1, s2, s3, s4, s5, s6, s7 = lstm_states

    # Stage 0: enc0 conv 5x5 s2 + LayerNorm.
    if cfg.enc0_space_to_depth:
        x = layers.conv2d_s2d(params["enc0"], prev_image)
    else:
        x = layers.conv2d(params["enc0"], prev_image, stride=2)
    enc0 = relu(layers.layer_norm_flat(params["norm_enc0"], x, eps))

    # Stage 1: lstm1 -> LN -> lstm2 -> LN -> enc1 conv 3x3 s2.
    s1, h = cell(params["lstm1"], s1, enc0)
    h1 = layers.layer_norm_flat(params["hidden1"], h, eps)
    s2, h = cell(params["lstm2"], s2, h1)
    h2 = layers.layer_norm_flat(params["hidden2"], h, eps)
    enc1 = relu(layers.conv2d(params["enc1"], h2, stride=2))

    # Stage 2: lstm3 -> LN -> lstm4 -> LN -> enc2 conv 3x3 s2.
    s3, h = cell(params["lstm3"], s3, enc1)
    h3 = layers.layer_norm_flat(params["hidden3"], h, eps)
    s4, h = cell(params["lstm4"], s4, h3)
    h4 = layers.layer_norm_flat(params["hidden4"], h, eps)
    enc2 = relu(layers.conv2d(params["enc2"], h4, stride=2))

    # Stage 3: smear state/action over space, concat, enc3 conv 1x1
    # (train_model.py:556-567, 598).
    x = enc2
    if cfg.use_state:
        b, hh, ww, _ = x.shape
        smear = jnp.broadcast_to(
            state_action[:, None, None, :].astype(x.dtype),
            (b, hh, ww, state_action.shape[-1]))
        x = jnp.concatenate([x, smear], axis=-1)
    enc3 = relu(layers.conv2d(params["enc3"], x, stride=1, padding=0,
                              as_matmul=cfg.one_by_one_matmul))

    # Stage 4: lstm5 -> LN(hidden5) -> enc4 deconv up to H/4.
    s5, h = cell(params["lstm5"], s5, enc3)
    h5 = layers.layer_norm_flat(params["hidden5"], h, eps)
    (r0, r1, r2, _) = _resolutions(cfg)
    enc4 = relu(layers.deconv2d(params["enc4"], h5, stride=2, padding=1,
                                outsize=r2))

    # Stage 5: lstm6 -> LN -> skip(enc1) -> enc5 deconv up to H/2
    # (skip connections: train_model.py:569-576, 600-601).
    s6, h = cell(params["lstm6"], s6, enc4)
    h6 = layers.layer_norm_flat(params["hidden6"], h, eps)
    x = jnp.concatenate([h6, enc1], axis=-1)
    enc5 = relu(layers.deconv2d(params["enc5"], x, stride=2, padding=1,
                                outsize=r1))

    # Stage 6: lstm7 -> LN -> skip(enc0) -> enc6 deconv up to H + LN.
    s7, h = cell(params["lstm7"], s7, enc5)
    h7 = layers.layer_norm_flat(params["hidden7"], h, eps)
    x = jnp.concatenate([h7, enc0], axis=-1)
    x = layers.deconv2d(params["enc6"], x, stride=2, padding=1, outsize=r0)
    enc6 = relu(layers.layer_norm_flat(params["norm_enc6"], x, eps))

    # Head + masks + composite (train_model.py:711-728).
    #
    # The mask deconv (train_model.py:527) and the head's enc7 deconv
    # (:288/:364/:429) are both 1x1 stride-1 convs on enc6; with
    # merge_output_convs they run as ONE conv over concatenated output
    # channels and are split afterwards — per-channel math is unchanged
    # (the channel axis is the GEMM N dim), but one latency-bound
    # small-N conv (plus its backward) disappears per timestep
    # (measured: tools/bench_conv_channels.py, ~1.4 ms/step at B=32).
    enc7_raw = None
    if cfg.merge_output_convs:
        mw, hw = params["masks"], params["head"]["enc7"]
        merged = {"w": jnp.concatenate([mw["w"], hw["w"]], axis=-1),
                  "b": jnp.concatenate([mw["b"], hw["b"]])}
        out = layers.deconv2d(merged, enc6, stride=1, padding=0,
                              as_matmul=cfg.one_by_one_matmul)
        n_mask = cfg.num_masks + 1
        mask_logits = out[..., :n_mask]
        enc7_raw = out[..., n_mask:]
    else:
        mask_logits = layers.deconv2d(params["masks"], enc6, stride=1,
                                      padding=0,
                                      as_matmul=cfg.one_by_one_matmul)
    if cfg.is_cdna and cfg.fused_cdna:
        # Fused path: masked CDNA mixture collapsed to one per-pixel
        # kernel (transforms.fused_cdna_composite) — algebraically equal
        # to the candidate-stack + zip-truncated composite below.
        synth, kerns, enc7 = heads.cdna_head_parts(
            params["head"], cfg, enc6, h5, enc7_raw)
        local = None
        if cfg.use_pallas:
            from pivp_tpu.ops.pallas import local_apply as pallas_apply
            interp = cfg.pallas_interpret
            local = lambda x, w: pallas_apply.local_kernel_apply(
                x, w, interp)
        gen_image = transforms.fused_cdna_composite(
            prev_image, synth, kerns, mask_logits, local_apply=local,
            scramble=cfg.chainer_mask_scramble)
    else:
        # Candidate-stack formulation; zip-truncation keeps only the
        # first num_masks candidates.
        _, head_fn = heads.HEADS[cfg.model_type]
        candidates, enc7 = head_fn(params["head"], cfg, enc6, h5,
                                   prev_image, enc7_raw)
        gen_image, _ = transforms.mask_composite(
            prev_image, candidates[:, :cfg.num_masks], mask_logits,
            scramble=cfg.chainer_mask_scramble)

    # State predictor fed back each step (train_model.py:730-731).
    gen_state = layers.dense(
        params["state_pred"],
        state_action.astype(jnp.promote_types(state_action.dtype,
                                              jnp.float32)))

    new_states = (s1, s2, s3, s4, s5, s6, s7)
    encs = (enc0, enc1, enc2, enc3, enc4, enc5, enc6, enc7) if capture \
        else None
    return new_states, StepOutput(gen_image, gen_state, encs)


# ---------------------------------------------------------------------------
# Rollout over time as a single scan
# ---------------------------------------------------------------------------

def rollout(params: Params, cfg: ModelConfig, images: jnp.ndarray,
            actions: jnp.ndarray, states: jnp.ndarray,
            iter_num: jnp.ndarray, rng: jax.Array, *,
            train: bool = True, capture: bool = False,
            remat: bool = False) -> Dict[str, jnp.ndarray]:
    """Run the full T-step prediction and compute losses.

    Args:
      images: (T, B, H, W, C) float in [0, 1], time-major.
      actions/states: (T, B, 5).
      iter_num: scalar used by the scheduled-sampling decay.
      train: static — False disables scheduled sampling entirely
        (pure feed-self after context; train_model.py:648-650).

    Returns dict: loss, psnr_all (summed over predicted frames, reference
    convention), gen_images (T-1, B, H, W, C), gen_states, per-frame
    recon/psnr/state curves, ssim, psnr_per_image.
    """
    t_total, batch = images.shape[0], images.shape[1]
    dtype = cfg.dtype
    # State/metric accumulation dtype: f32, widened to f64 on the
    # numerics-debug path (compute_dtype='float64' under jax_enable_x64).
    sdt = jnp.promote_types(jnp.float32, dtype)
    if jnp.issubdtype(images.dtype, jnp.integer):
        # uint8 host->device transfer path: dequantize on device (the
        # robot-push frames are uint8/255 at the source, so this is
        # lossless and quarters the host->device traffic).
        images = images.astype(jnp.float32) / 255.0
    images_c = images.astype(dtype)

    if dtype != jnp.float32:
        # Hoist the f32 -> compute-dtype parameter casts out of the time
        # scan: layers cast weights at use, which inside lax.scan would
        # re-cast every timestep (XLA does not reliably hoist
        # loop-invariant converts). Gradients still accumulate in f32
        # through the cast's transpose. LayerNorm statistics stay f32
        # (layer_norm_flat computes in f32 regardless of param dtype).
        params = jax.tree_util.tree_map(
            lambda p: p.astype(dtype)
            if p.dtype == jnp.float32 else p, params)

    feedself = (not train) or (cfg.scheduled_sampling_k == -1)
    if not feedself:
        n_gt = sampling.num_ground_truth(
            batch, cfg.scheduled_sampling_k, jnp.asarray(iter_num))
    else:
        n_gt = jnp.int32(0)

    step_keys = jax.random.split(rng, t_total - 1)
    ts = jnp.arange(t_total - 1)

    def scan_step(carry, xs):
        lstm_states, prev_gen, current_state = carry
        t, gt_image, action, key = xs

        if feedself:
            candidate = prev_gen
        else:
            candidate = sampling.scheduled_sample(
                key, gt_image, prev_gen, n_gt,
                detach_sampled=cfg.detach_sampled)
        # Warm start: ground truth for the first context_frames steps
        # (train_model.py:663-673).
        prev_image = jnp.where(t < cfg.context_frames, gt_image, candidate)

        state_action = jnp.concatenate(
            [action, current_state], axis=-1).astype(sdt)

        step = functools.partial(forward_step, capture=capture)
        if remat:
            step = jax.checkpoint(step, static_argnums=(1,))
        new_lstm, out = step(params, cfg, lstm_states, prev_image,
                             state_action)
        new_carry = (new_lstm, out.gen_image, out.gen_state)
        return new_carry, out

    init_carry = (
        init_lstm_states(cfg, batch, dtype),
        jnp.zeros_like(images_c[0]),
        states[0].astype(sdt),
    )
    xs = (ts, images_c[:-1], actions[:-1].astype(sdt), step_keys)
    _, outs = jax.lax.scan(scan_step, init_carry, xs,
                           unroll=cfg.scan_unroll)

    gen_images = outs.gen_image          # (T-1, B, H, W, C)
    gen_states = outs.gen_state          # (T-1, B, S)

    # --- losses (train_model.py:736-764) --------------------------------
    ctx = cfg.context_frames
    true_imgs = images[ctx:].astype(sdt)
    pred_imgs = gen_images[ctx - 1:].astype(sdt)
    true_states = states[ctx:].astype(sdt)
    pred_states = gen_states[ctx - 1:]

    # Per-frame reconstruction cost and PSNR (vmap over time).
    recon_costs = jax.vmap(metrics.mean_squared_error)(true_imgs, pred_imgs)
    psnrs = jax.vmap(metrics.peak_signal_to_noise_ratio)(true_imgs,
                                                         pred_imgs)
    state_costs = jax.vmap(metrics.mean_squared_error)(
        true_states, pred_states) * cfg.state_cost_weight

    num_pred = t_total - ctx
    loss = (jnp.sum(recon_costs) + jnp.sum(state_costs)) / num_pred
    psnr_all = jnp.sum(psnrs)

    result = {
        "loss": loss,
        "psnr_all": psnr_all,
        "gen_images": gen_images,
        "gen_states": gen_states,
        "recon_costs": recon_costs,
        "psnrs": psnrs,
        "state_costs": state_costs,
        "psnr_per_image": jax.vmap(metrics.psnr_per_image)(
            true_imgs, pred_imgs).mean(),
        "ssim": jax.vmap(metrics.structural_similarity)(
            true_imgs, pred_imgs).mean(),
        # Per-(frame, sequence) matrices (T-ctx, B): the validation sweep
        # aggregates these exactly over the real (non-padded) sequences,
        # making validation metrics invariant to batch size.
        "recon_mse_tb": jax.vmap(metrics.per_image_mse)(true_imgs,
                                                        pred_imgs),
        "state_mse_tb": jax.vmap(metrics.per_image_mse)(true_states,
                                                        pred_states),
        "ssim_tb": jax.vmap(metrics.ssim_per_image)(true_imgs, pred_imgs),
    }
    if capture:
        # Last-timestep activations, mirroring Model.conv_res
        # (train_model.py:734, which keeps the final loop iteration's
        # encs), plus the full per-timestep stacks (T-1, B, ...) for
        # multi-frame activation visualization.
        result["conv_res"] = tuple(e[-1] for e in outs.encs)
        result["conv_res_all"] = outs.encs
    return result


def predict(params: Params, cfg: ModelConfig, images: jnp.ndarray,
            actions: jnp.ndarray, states: jnp.ndarray,
            rng: Optional[jax.Array] = None) -> Dict[str, jnp.ndarray]:
    """Inference: pure autoregressive rollout after the context frames
    (predict_model.py:126-128 semantics: train=False)."""
    if rng is None:
        rng = jax.random.PRNGKey(0)
    return rollout(params, cfg, images, actions, states,
                   jnp.float32(0.0), rng, train=False)
