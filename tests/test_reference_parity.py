"""Golden parity gate vs the reference model's math (the BASELINE.json
north star: <0.1 dB PSNR delta on 10-step rollouts).

The oracle (tests/chainer_oracle.py) is an independent NCHW float64
transcription of /root/reference/src/models/train_model.py run on weights
exported through `export_reference_npz` (the Chainer checkpoint layout),
so this gate verifies, end to end:
  * the converter's weight-layout mapping (NCHW<->NHWC, CHW-flat Linear
    permutation, flattened LayerNorm reshape);
  * the JAX model's forward semantics for all three heads (trunk op
    table, ConvLSTM gate order, deconv outsize padding, LN eps,
    kernel normalization, compositing);
  * the literal-quirk compat flags (chainer_mask_scramble,
    dna_border_zero, stp_shared_params) in quirk mode, and the
    original-TF intent semantics in intent mode.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.heavy

from pivp_tpu.config import ModelConfig
from pivp_tpu.models import predictor
from pivp_tpu.utils.checkpoint import export_reference_npz

from chainer_oracle import ChainerOracle

T, B, H, W = 10, 4, 64, 64
PSNR_GATE_DB = 0.1


def _fixture_params(cfg: ModelConfig, seed: int = 7):
    """Init params, then re-randomize every leaf so the network's behavior
    is non-trivial (LN affines non-identity, masks non-uniform): a parity
    bug in any permutation/eps/gate-order would shift the outputs."""
    params = predictor.init_params(jax.random.PRNGKey(seed), cfg)
    leaves, treedef = jax.tree_util.tree_flatten_with_path(params)
    rng = np.random.RandomState(seed)
    new = []
    for path, leaf in leaves:
        arr = np.asarray(leaf)
        name = str(path[-1])
        # Scales are kept moderate so the autoregressive rollout stays
        # contractive (as for a trained model): f32-vs-f64 rounding would
        # otherwise amplify chaotically through the 8 feedback steps and
        # the comparison would measure chaos, not semantics.
        if "scale" in name:
            new.append(rng.uniform(0.9, 1.1, arr.shape).astype(arr.dtype))
        else:
            new.append(rng.uniform(-0.08, 0.08, arr.shape).astype(arr.dtype))
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(params), new)


def _fixture_batch(seed: int = 3):
    rng = np.random.RandomState(seed)
    images = rng.uniform(0.0, 1.0, (T, B, H, W, 3)).astype(np.float32)
    actions = rng.uniform(-1.0, 1.0, (T, B, 5)).astype(np.float32)
    states = rng.uniform(-1.0, 1.0, (T, B, 5)).astype(np.float32)
    return images, actions, states


def _run_pair(cfg: ModelConfig, literal_quirks: bool, tmp_path):
    params = _fixture_params(cfg)
    images, actions, states = _fixture_batch()

    ckpt = str(tmp_path / "ref_layout.npz")
    export_reference_npz(ckpt, cfg, params)
    oracle = ChainerOracle(ckpt, model_type=cfg.model_type,
                           num_masks=cfg.num_masks, use_state=cfg.use_state,
                           context_frames=cfg.context_frames,
                           literal_quirks=literal_quirks,
                           stp_shared_params=cfg.stp_shared_params)
    ref = oracle.rollout(np.transpose(images, (0, 1, 4, 2, 3)),
                         actions, states)

    out = predictor.predict(params, cfg, jnp.asarray(images),
                            jnp.asarray(actions), jnp.asarray(states))
    gen = np.asarray(out["gen_images"])                  # (T-1,B,H,W,C)
    ref_gen = np.transpose(ref["gen_images"], (0, 1, 3, 4, 2))
    return out, ref, gen, ref_gen


def _assert_parity(out, ref, gen, ref_gen):
    # Direct agreement of the generated frames (f32 model vs f64 oracle).
    # (3e-3 headroom: STP's bilinear floor() boundaries are f32/f64
    # sensitive; measured deltas are ~1e-6 for CDNA/DNA, ~7e-4 for STP.)
    img_diff = np.max(np.abs(gen - ref_gen))
    assert img_diff < 3e-3, f"max |gen - oracle| = {img_diff}"
    # The north-star gate: per-frame PSNR delta < 0.1 dB over the 10-step
    # rollout (BASELINE.json).
    psnr_model = np.asarray(out["psnrs"])
    psnr_ref = np.asarray(ref["psnrs"])
    delta = np.max(np.abs(psnr_model - psnr_ref))
    assert delta < PSNR_GATE_DB, (
        f"PSNR delta {delta:.4f} dB >= {PSNR_GATE_DB} dB "
        f"(model {psnr_model}, oracle {psnr_ref})")
    assert abs(out["loss"] - ref["loss"]) < 1e-5 * max(1.0, abs(ref["loss"]))
    return delta, img_diff


# -- quirk mode: bit-honest reproduction of the Chainer port ----------------

@pytest.mark.parametrize("model_type", ["CDNA", "DNA", "STP"])
def test_literal_parity(model_type, tmp_path):
    cfg = ModelConfig(
        model_type=model_type,
        num_masks=1 if model_type == "DNA" else 10,
        chainer_mask_scramble=True,
        dna_border_zero=(model_type == "DNA"),
        stp_shared_params=True,
    )
    out, ref, gen, ref_gen = _run_pair(cfg, literal_quirks=True,
                                       tmp_path=tmp_path)
    delta, img_diff = _assert_parity(out, ref, gen, ref_gen)
    print(f"[parity:{model_type}:literal] max dPSNR={delta:.2e} dB, "
          f"max |dI|={img_diff:.2e}")


# -- intent mode: the original-TF semantics both sides ----------------------

@pytest.mark.parametrize("model_type", ["CDNA", "DNA", "STP"])
def test_intent_parity(model_type, tmp_path):
    cfg = ModelConfig(
        model_type=model_type,
        num_masks=1 if model_type == "DNA" else 10,
    )
    out, ref, gen, ref_gen = _run_pair(cfg, literal_quirks=False,
                                       tmp_path=tmp_path)
    delta, img_diff = _assert_parity(out, ref, gen, ref_gen)
    print(f"[parity:{model_type}:intent] max dPSNR={delta:.2e} dB, "
          f"max |dI|={img_diff:.2e}")


# -- STP per-mask heads: the original-TF semantics the reference quirked
# away (train_model.py:465-467). This is the one head branch the shared-
# params gates above never touch: distinct Linear(6) per mask, so the
# warps genuinely differ. Oracle reads model/identity_params_{i} keys. ----

def test_intent_parity_stp_per_mask(tmp_path):
    cfg = ModelConfig(model_type="STP", num_masks=10,
                      stp_shared_params=False)
    out, ref, gen, ref_gen = _run_pair(cfg, literal_quirks=False,
                                       tmp_path=tmp_path)
    delta, img_diff = _assert_parity(out, ref, gen, ref_gen)
    print(f"[parity:STP:per-mask] max dPSNR={delta:.2e} dB, "
          f"max |dI|={img_diff:.2e}")


# -- the quirk flags must actually change the output ------------------------

def test_quirk_flags_change_output():
    images, actions, states = _fixture_batch()
    base = ModelConfig(model_type="DNA", num_masks=1)
    params = _fixture_params(base)

    def run(cfg):
        return np.asarray(predictor.predict(
            params, cfg, jnp.asarray(images), jnp.asarray(actions),
            jnp.asarray(states))["gen_images"])

    plain = run(base)
    scrambled = run(ModelConfig(model_type="DNA", num_masks=1,
                                chainer_mask_scramble=True))
    bordered = run(ModelConfig(model_type="DNA", num_masks=1,
                               dna_border_zero=True))
    assert np.max(np.abs(plain - scrambled)) > 1e-5
    assert np.max(np.abs(plain - bordered)) > 1e-5


# -- non-default geometry: the converter's LN-reshape / CHW-flat Linear
# permutations are resolution-dependent; a 64x64-only gate could hide a
# hardcoded-size bug ------------------------------------------------------

def test_intent_parity_32x32(tmp_path):
    cfg = ModelConfig(model_type="CDNA", num_masks=10,
                      image_height=32, image_width=32)
    params = _fixture_params(cfg)
    rng = np.random.RandomState(11)
    images = rng.uniform(0.0, 1.0, (T, B, 32, 32, 3)).astype(np.float32)
    actions = rng.uniform(-1.0, 1.0, (T, B, 5)).astype(np.float32)
    states = rng.uniform(-1.0, 1.0, (T, B, 5)).astype(np.float32)

    ckpt = str(tmp_path / "ref_layout.npz")
    export_reference_npz(ckpt, cfg, params)
    oracle = ChainerOracle(ckpt, model_type="CDNA", num_masks=10,
                           use_state=True, context_frames=2,
                           literal_quirks=False)
    ref = oracle.rollout(np.transpose(images, (0, 1, 4, 2, 3)),
                         actions, states)
    out = predictor.predict(params, cfg, jnp.asarray(images),
                            jnp.asarray(actions), jnp.asarray(states))
    gen = np.asarray(out["gen_images"])
    ref_gen = np.transpose(ref["gen_images"], (0, 1, 3, 4, 2))
    delta, img_diff = _assert_parity(out, ref, gen, ref_gen)
    print(f"[parity:CDNA:32x32] max dPSNR={delta:.2e} dB, "
          f"max |dI|={img_diff:.2e}")
