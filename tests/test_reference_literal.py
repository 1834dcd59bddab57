"""--reference_literal mode: one switch that runs the reference Chainer
implementation's LITERAL semantics (all ModelConfig quirk flags at once —
mask-softmax scramble train_model.py:720-722, DNA border zeroing :395-405,
detached scheduled sampling :89-122, shared STP params :465-467).

The quirk MATH itself is oracle-gated in tests/test_reference_parity*.py;
these tests cover the mode's plumbing: config resolution, the predict-time
model loader, and that the flag actually reaches the compiled rollout.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from pivp_tpu import config as config_mod
from pivp_tpu.config import ModelConfig, TrainConfig

QUIRKS = ("stp_shared_params", "detach_sampled", "chainer_mask_scramble",
          "dna_border_zero")


def test_overrides_cover_every_quirk_flag():
    """REFERENCE_LITERAL_OVERRIDES must name exactly the quirk switches —
    a new ModelConfig quirk flag should be added there (or explicitly
    excluded here)."""
    assert set(config_mod.REFERENCE_LITERAL_OVERRIDES) == set(QUIRKS)
    assert all(v is True
               for v in config_mod.REFERENCE_LITERAL_OVERRIDES.values())


def test_as_reference_literal_sets_quirks_only():
    base = ModelConfig(model_type="DNA", num_masks=1)
    lit = config_mod.as_reference_literal(base)
    for name in QUIRKS:
        assert getattr(lit, name) is True, name
    # Everything else is untouched.
    for f in dataclasses.fields(ModelConfig):
        if f.name not in QUIRKS:
            assert getattr(lit, f.name) == getattr(base, f.name), f.name


def test_train_config_reference_literal_resolution():
    on = TrainConfig(reference_literal=True).model_config()
    off = TrainConfig().model_config()
    for name in QUIRKS:
        assert getattr(on, name) is True, name
    assert off.detach_sampled is False
    assert off.chainer_mask_scramble is False
    assert off.dna_border_zero is False
    # Literal mode changes semantics only — the perf knobs still resolve.
    assert on.compute_dtype == off.compute_dtype
    assert on.scan_unroll == off.scan_unroll


def test_load_model_reference_literal(tmp_path):
    from pivp_tpu.inference import predict as predict_lib
    from pivp_tpu.models import predictor
    from pivp_tpu.utils import checkpoint as ckpt_lib

    cfg = ModelConfig(model_type="CDNA", num_masks=2, sequence_length=4,
                      image_height=16, image_width=16)
    params = predictor.init_params(jax.random.PRNGKey(0), cfg)
    path = str(tmp_path / "training-final")
    ckpt_lib.save_npz(path, jax.device_get(params))

    loaded_cfg, _ = predict_lib.load_model(
        path + ".npz", "CDNA", 2, 2, True, sequence_length=4,
        image_height=16, image_width=16, reference_literal=True)
    for name in QUIRKS:
        assert getattr(loaded_cfg, name) is True, name


def test_literal_mode_changes_the_rollout():
    """The flag must reach the compiled math: with identical params and
    inputs, literal mode (mask scramble) produces different frames."""
    from pivp_tpu.data import synthetic
    from pivp_tpu.models import predictor

    base = ModelConfig(model_type="CDNA", num_masks=4, sequence_length=4,
                       context_frames=2, image_height=16, image_width=16)
    lit = config_mod.as_reference_literal(base)
    params = predictor.init_params(jax.random.PRNGKey(0), base)
    imgs, acts, stas = synthetic.generate_sequences(2, 4, 16, 16)
    args = (jnp.asarray(np.swapaxes(imgs, 0, 1)),
            jnp.asarray(np.swapaxes(acts, 0, 1)),
            jnp.asarray(np.swapaxes(stas, 0, 1)))

    def run(cfg):
        out = predictor.rollout(params, cfg, *args, jnp.float32(0.0),
                                jax.random.PRNGKey(1), train=False)
        return np.asarray(out["gen_images"])

    a, b = run(base), run(lit)
    assert a.shape == b.shape
    assert not np.allclose(a, b), (
        "literal mode produced identical frames — quirk flags not wired")
