"""Model-level tests: init, single-step forward, full rollout for all
three heads, gradient flow, and train/eval rollout modes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pivp_tpu.config import ModelConfig
from pivp_tpu.models import predictor


def tiny_cfg(**kw):
    base = dict(image_height=16, image_width=16, sequence_length=5,
                context_frames=2, num_masks=4)
    base.update(kw)
    return ModelConfig(**base)


def make_batch(cfg, batch=2, key=0):
    ks = jax.random.split(jax.random.PRNGKey(key), 3)
    t = cfg.sequence_length
    images = jax.random.uniform(
        ks[0], (t, batch, cfg.image_height, cfg.image_width,
                cfg.color_channels))
    actions = jax.random.normal(ks[1], (t, batch, cfg.action_dim))
    states = jax.random.normal(ks[2], (t, batch, cfg.state_dim))
    return images, actions, states


@pytest.mark.parametrize("model_type,num_masks",
                         [("CDNA", 4), ("DNA", 1), ("STP", 4)])
def test_rollout_all_heads(model_type, num_masks):
    cfg = tiny_cfg(model_type=model_type, num_masks=num_masks)
    params = predictor.init_params(jax.random.PRNGKey(0), cfg)
    images, actions, states = make_batch(cfg)
    out = predictor.rollout(params, cfg, images, actions, states,
                            jnp.float32(100.0), jax.random.PRNGKey(1),
                            train=True)
    t, b = cfg.sequence_length, 2
    assert out["gen_images"].shape == (t - 1, b, 16, 16, 3)
    assert out["gen_states"].shape == (t - 1, b, cfg.state_dim)
    assert np.isfinite(float(out["loss"]))
    assert np.isfinite(float(out["psnr_all"]))
    n_pred = t - cfg.context_frames
    assert out["recon_costs"].shape == (n_pred,)
    assert out["psnrs"].shape == (n_pred,)
    assert out["state_costs"].shape == (n_pred,)


def test_loss_matches_reference_reduction():
    """loss = (sum recon + sum state*1e-4) / (T - context); psnr_all is a
    SUM over predicted frames (train_model.py:736-758)."""
    cfg = tiny_cfg()
    params = predictor.init_params(jax.random.PRNGKey(0), cfg)
    images, actions, states = make_batch(cfg)
    out = predictor.rollout(params, cfg, images, actions, states,
                            jnp.float32(0.0), jax.random.PRNGKey(1),
                            train=False)
    n_pred = cfg.sequence_length - cfg.context_frames
    expected = (float(jnp.sum(out["recon_costs"]))
                + float(jnp.sum(out["state_costs"]))) / n_pred
    np.testing.assert_allclose(float(out["loss"]), expected, rtol=1e-5)
    np.testing.assert_allclose(float(out["psnr_all"]),
                               float(jnp.sum(out["psnrs"])), rtol=1e-5)


def test_warm_start_uses_ground_truth():
    """During the context frames the model must consume ground truth: the
    first generated frame differs depending only on gt frame content."""
    cfg = tiny_cfg()
    params = predictor.init_params(jax.random.PRNGKey(0), cfg)
    images, actions, states = make_batch(cfg)
    out1 = predictor.rollout(params, cfg, images, actions, states,
                             jnp.float32(0.0), jax.random.PRNGKey(1),
                             train=False)
    images2 = images.at[0].set(images[0] * 0.5)
    out2 = predictor.rollout(params, cfg, images2, actions, states,
                             jnp.float32(0.0), jax.random.PRNGKey(1),
                             train=False)
    assert not np.allclose(np.asarray(out1["gen_images"][0]),
                           np.asarray(out2["gen_images"][0]))


def test_eval_mode_is_deterministic_and_feeds_self():
    """train=False -> feedself; rng must not matter."""
    cfg = tiny_cfg()
    params = predictor.init_params(jax.random.PRNGKey(0), cfg)
    images, actions, states = make_batch(cfg)
    o1 = predictor.rollout(params, cfg, images, actions, states,
                           jnp.float32(0.0), jax.random.PRNGKey(1),
                           train=False)
    o2 = predictor.rollout(params, cfg, images, actions, states,
                           jnp.float32(0.0), jax.random.PRNGKey(99),
                           train=False)
    np.testing.assert_allclose(np.asarray(o1["gen_images"]),
                               np.asarray(o2["gen_images"]), rtol=1e-6)


def test_gradients_finite_and_nonzero():
    cfg = tiny_cfg()
    params = predictor.init_params(jax.random.PRNGKey(0), cfg)
    images, actions, states = make_batch(cfg)

    def loss_fn(p):
        return predictor.rollout(p, cfg, images, actions, states,
                                 jnp.float32(100.0), jax.random.PRNGKey(1),
                                 train=True)["loss"]

    grads = jax.grad(loss_fn)(params)
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    total = sum(float(jnp.sum(jnp.abs(g))) for g in leaves)
    assert total > 0


def test_remat_matches_plain():
    cfg = tiny_cfg()
    params = predictor.init_params(jax.random.PRNGKey(0), cfg)
    images, actions, states = make_batch(cfg)
    o1 = predictor.rollout(params, cfg, images, actions, states,
                           jnp.float32(0.0), jax.random.PRNGKey(1),
                           train=False, remat=False)
    o2 = predictor.rollout(params, cfg, images, actions, states,
                           jnp.float32(0.0), jax.random.PRNGKey(1),
                           train=False, remat=True)
    np.testing.assert_allclose(np.asarray(o1["gen_images"]),
                               np.asarray(o2["gen_images"]), rtol=1e-5,
                               atol=1e-6)


def test_capture_activations():
    cfg = tiny_cfg()
    params = predictor.init_params(jax.random.PRNGKey(0), cfg)
    images, actions, states = make_batch(cfg)
    out = predictor.rollout(params, cfg, images, actions, states,
                            jnp.float32(0.0), jax.random.PRNGKey(1),
                            train=False, capture=True)
    convs = out["conv_res"]
    assert len(convs) == 8  # enc0..enc7, like Model.conv_res
    assert convs[0].shape == (2, 8, 8, 32)       # enc0 @ H/2
    assert convs[6].shape == (2, 16, 16, 64)     # enc6 @ H


def test_use_state_false():
    cfg = tiny_cfg(use_state=False)
    params = predictor.init_params(jax.random.PRNGKey(0), cfg)
    images, actions, states = make_batch(cfg)
    out = predictor.rollout(params, cfg, images, actions, states,
                            jnp.float32(0.0), jax.random.PRNGKey(1),
                            train=False)
    assert np.isfinite(float(out["loss"]))


def test_dna_requires_single_mask():
    with pytest.raises(ValueError):
        tiny_cfg(model_type="DNA", num_masks=4)


def test_predict_entrypoint():
    cfg = tiny_cfg()
    params = predictor.init_params(jax.random.PRNGKey(0), cfg)
    images, actions, states = make_batch(cfg)
    out = predictor.predict(params, cfg, images, actions, states)
    assert out["gen_images"].shape[0] == cfg.sequence_length - 1
