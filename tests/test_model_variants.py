"""Variant coverage: STP per-mask params, bf16 compute, DNA/STP training
smoke, and eval determinism across compute configs."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy

from pivp_tpu.config import ModelConfig
from pivp_tpu.data import dataset as dataset_lib
from pivp_tpu.data import synthetic
from pivp_tpu.models import predictor
from pivp_tpu.parallel import train_step as ts_lib


def tiny_cfg(**kw):
    base = dict(image_height=16, image_width=16, sequence_length=4,
                context_frames=2, num_masks=3)
    base.update(kw)
    return ModelConfig(**base)


def make_batch(cfg, batch=4, key=0):
    imgs, acts, stas = synthetic.generate_sequences(
        batch, cfg.sequence_length, cfg.image_height, cfg.image_width,
        seed=key)
    return dataset_lib.to_time_major(imgs, acts, stas)


def test_stp_per_mask_params_differ_from_shared():
    """stp_shared_params=False gives each mask its own affine projection;
    the reference quirk (shared Linear(6)) makes all warps identical."""
    cfg_s = tiny_cfg(model_type="STP", stp_shared_params=True)
    cfg_p = dataclasses.replace(cfg_s, stp_shared_params=False)
    p_s = predictor.init_params(jax.random.PRNGKey(0), cfg_s)
    p_p = predictor.init_params(jax.random.PRNGKey(0), cfg_p)
    assert isinstance(p_p["head"]["identity_params"], list)
    assert len(p_p["head"]["identity_params"]) == cfg_p.num_masks - 1

    from pivp_tpu.models import heads

    enc6 = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 64))
    h5 = jax.random.normal(jax.random.PRNGKey(2), (2, 2, 2, 128))
    prev = jax.random.uniform(jax.random.PRNGKey(3), (2, 16, 16, 3))
    cand_s, _ = heads.stp_head(p_s["head"], cfg_s, enc6, h5, prev)
    # Shared params: every warp candidate (indices 1..) is identical.
    for i in range(2, cfg_s.num_masks):
        np.testing.assert_allclose(np.asarray(cand_s[:, 1]),
                                   np.asarray(cand_s[:, i]), rtol=1e-6)
    cand_p, _ = heads.stp_head(p_p["head"], cfg_p, enc6, h5, prev)
    assert not np.allclose(np.asarray(cand_p[:, 1]),
                           np.asarray(cand_p[:, 2]))


@pytest.mark.parametrize("model_type,num_masks", [("DNA", 1), ("STP", 3)])
def test_variant_training_smoke(model_type, num_masks):
    cfg = tiny_cfg(model_type=model_type, num_masks=num_masks,
                   scheduled_sampling_k=-1.0)
    opt = ts_lib.make_optimizer(3e-3)
    state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = ts_lib.make_train_step(cfg, opt, mesh=None)
    batch = make_batch(cfg)
    losses = []
    for i in range(15):
        state, m = step(state, batch, jnp.float32(i),
                        jax.random.PRNGKey(i))
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses


def test_bf16_rollout_close_to_f32():
    cfg32 = tiny_cfg()
    cfg16 = dataclasses.replace(cfg32, compute_dtype="bfloat16")
    params = predictor.init_params(jax.random.PRNGKey(0), cfg32)
    images, actions, states = make_batch(cfg32)
    o32 = predictor.rollout(params, cfg32, jnp.asarray(images),
                            jnp.asarray(actions), jnp.asarray(states),
                            jnp.float32(0.0), jax.random.PRNGKey(1),
                            train=False)
    o16 = predictor.rollout(params, cfg16, jnp.asarray(images),
                            jnp.asarray(actions), jnp.asarray(states),
                            jnp.float32(0.0), jax.random.PRNGKey(1),
                            train=False)
    assert o16["gen_images"].dtype == jnp.bfloat16
    # bf16 has ~3 decimal digits; frames are in [0,1].
    np.testing.assert_allclose(
        np.asarray(o32["gen_images"], np.float32),
        np.asarray(o16["gen_images"], np.float32), atol=0.05)
    np.testing.assert_allclose(float(o32["loss"]), float(o16["loss"]),
                               rtol=0.1)


def test_invalid_compute_dtype_rejected():
    with pytest.raises(ValueError, match="compute_dtype"):
        tiny_cfg(compute_dtype="float99")


def test_lstm_gate_compute_variants():
    """bf16 gate math must run and stay close to the f32-gate rollout;
    'auto' resolves with the compute dtype; bad values are rejected."""
    import pytest

    from pivp_tpu.config import TrainConfig
    from pivp_tpu.data import dataset as dataset_lib
    from pivp_tpu.data import synthetic

    imgs, acts, stas = synthetic.generate_sequences(2, 4, 16, 16)
    batch = dataset_lib.to_time_major(imgs, acts, stas)

    def roll(gate):
        cfg = ModelConfig(image_height=16, image_width=16,
                          sequence_length=4, context_frames=2,
                          num_masks=3, compute_dtype="bfloat16",
                          lstm_gate_compute=gate)
        params = predictor.init_params(jax.random.PRNGKey(0), cfg)
        out = predictor.rollout(params, cfg, *map(jnp.asarray, batch),
                                jnp.float32(0.0), jax.random.PRNGKey(0),
                                train=False)
        return float(out["loss"]), np.asarray(out["gen_images"],
                                              np.float32)

    l32, g32 = roll("float32")
    lc, gc = roll("compute")
    assert np.isfinite(lc)
    np.testing.assert_allclose(lc, l32, rtol=0.05)
    np.testing.assert_allclose(gc, g32, atol=0.05)

    with pytest.raises(ValueError, match="lstm_gate_compute"):
        ModelConfig(image_height=16, image_width=16, sequence_length=4,
                    context_frames=2, num_masks=3,
                    lstm_gate_compute="bf16")

    # TrainConfig auto resolution follows the resolved compute dtype.
    m = TrainConfig(compute_dtype="float32").model_config()
    assert m.lstm_gate_compute == "float32"
    m = TrainConfig(compute_dtype="bfloat16").model_config()
    assert m.lstm_gate_compute == "compute"
