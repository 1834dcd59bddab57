"""The fused CDNA+composite path must match the literal candidate-stack
formulation exactly (same algebra, different evaluation order)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pivp_tpu.config import ModelConfig
from pivp_tpu.models import predictor
from pivp_tpu.ops import transforms


def test_fused_composite_matches_unfused_op():
    b, h, w, c, m, k = 2, 8, 8, 3, 5, 5
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    prev = jax.random.uniform(ks[0], (b, h, w, c))
    synth = jax.random.uniform(ks[1], (b, h, w, c))
    kerns = transforms.normalize_cdna_kernels(
        jax.random.uniform(ks[2], (b, m, k * k)) + 0.1)
    logits = jax.random.normal(ks[3], (b, h, w, m + 1))

    fused = transforms.fused_cdna_composite(prev, synth, kerns, logits)

    moved = transforms.cdna_apply(prev, kerns)
    candidates = jnp.concatenate([synth[:, None], moved], axis=1)
    unfused, _ = transforms.mask_composite(prev, candidates[:, :m], logits)

    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused),
                               rtol=1e-5, atol=1e-6)


def test_fused_rollout_matches_unfused():
    cfg_f = ModelConfig(image_height=16, image_width=16,
                        sequence_length=4, num_masks=4, fused_cdna=True)
    cfg_u = dataclasses.replace(cfg_f, fused_cdna=False)
    params = predictor.init_params(jax.random.PRNGKey(0), cfg_f)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    images = jax.random.uniform(ks[0], (4, 2, 16, 16, 3))
    actions = jax.random.normal(ks[1], (4, 2, 5))
    states = jax.random.normal(ks[2], (4, 2, 5))

    of = predictor.rollout(params, cfg_f, images, actions, states,
                           jnp.float32(0.0), jax.random.PRNGKey(2),
                           train=False)
    ou = predictor.rollout(params, cfg_u, images, actions, states,
                           jnp.float32(0.0), jax.random.PRNGKey(2),
                           train=False)
    np.testing.assert_allclose(np.asarray(of["gen_images"]),
                               np.asarray(ou["gen_images"]), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(float(of["loss"]), float(ou["loss"]),
                               rtol=1e-4)


@pytest.mark.heavy
def test_fused_gradients_match():
    cfg_f = ModelConfig(image_height=16, image_width=16,
                        sequence_length=4, num_masks=4, fused_cdna=True)
    cfg_u = dataclasses.replace(cfg_f, fused_cdna=False)
    params = predictor.init_params(jax.random.PRNGKey(0), cfg_f)
    ks = jax.random.split(jax.random.PRNGKey(1), 3)
    images = jax.random.uniform(ks[0], (4, 2, 16, 16, 3))
    actions = jax.random.normal(ks[1], (4, 2, 5))
    states = jax.random.normal(ks[2], (4, 2, 5))

    def loss(p, cfg):
        return predictor.rollout(p, cfg, images, actions, states,
                                 jnp.float32(0.0), jax.random.PRNGKey(2),
                                 train=False)["loss"]

    gf = jax.grad(lambda p: loss(p, cfg_f))(params)
    gu = jax.grad(lambda p: loss(p, cfg_u))(params)
    for a, b in zip(jax.tree_util.tree_leaves(gf),
                    jax.tree_util.tree_leaves(gu)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)