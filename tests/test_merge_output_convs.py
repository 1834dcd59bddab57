"""The merged masks+enc7 output conv (ModelConfig.merge_output_convs)
must match the two-conv formulation: concatenating output channels of two
1x1 convs over the same input leaves every per-channel dot product
unchanged (reference convs: train_model.py:527 masks, :288/:364/:429
enc7)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pivp_tpu.config import ModelConfig
from pivp_tpu.models import predictor


def _data(key, t=4, b=2, hw=16):
    ks = jax.random.split(key, 3)
    return (jax.random.uniform(ks[0], (t, b, hw, hw, 3)),
            jax.random.normal(ks[1], (t, b, 5)),
            jax.random.normal(ks[2], (t, b, 5)))


@pytest.mark.parametrize("model_type,num_masks,fused",
                         [("CDNA", 4, True), ("CDNA", 4, False),
                          ("DNA", 1, False), ("STP", 4, False)])
def test_merged_rollout_matches_split(model_type, num_masks, fused):
    cfg_m = ModelConfig(model_type=model_type, num_masks=num_masks,
                        image_height=16, image_width=16,
                        sequence_length=4, fused_cdna=fused,
                        merge_output_convs=True)
    cfg_s = dataclasses.replace(cfg_m, merge_output_convs=False)
    params = predictor.init_params(jax.random.PRNGKey(0), cfg_m)
    images, actions, states = _data(jax.random.PRNGKey(1))

    om = predictor.rollout(params, cfg_m, images, actions, states,
                           jnp.float32(0.0), jax.random.PRNGKey(2),
                           train=False)
    os_ = predictor.rollout(params, cfg_s, images, actions, states,
                            jnp.float32(0.0), jax.random.PRNGKey(2),
                            train=False)
    np.testing.assert_allclose(np.asarray(om["gen_images"]),
                               np.asarray(os_["gen_images"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(om["loss"]), float(os_["loss"]),
                               rtol=1e-5)


@pytest.mark.heavy
def test_merged_gradients_match():
    cfg_m = ModelConfig(image_height=16, image_width=16,
                        sequence_length=4, num_masks=4,
                        merge_output_convs=True)
    cfg_s = dataclasses.replace(cfg_m, merge_output_convs=False)
    params = predictor.init_params(jax.random.PRNGKey(0), cfg_m)
    images, actions, states = _data(jax.random.PRNGKey(1))

    def loss(p, cfg):
        return predictor.rollout(p, cfg, images, actions, states,
                                 jnp.float32(0.0), jax.random.PRNGKey(2),
                                 train=True)["loss"]

    gm = jax.grad(lambda p: loss(p, cfg_m))(params)
    gs = jax.grad(lambda p: loss(p, cfg_s))(params)
    # The split of the merged conv's cotangent back onto params["masks"]
    # and params["head"]["enc7"] must be exact — same leaves, same math.
    fm = jax.tree_util.tree_leaves_with_path(gm)
    fs = jax.tree_util.tree_leaves_with_path(gs)
    assert [p for p, _ in fm] == [p for p, _ in fs]
    for (path, a), (_, b) in zip(fm, fs):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6,
                                   err_msg=str(path))
