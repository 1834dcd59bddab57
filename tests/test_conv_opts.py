"""Equivalence gates for the round-5 conv-floor optimizations:

  * pad_gate_convs — forward-only MXU input-channel padding of the
    ConvLSTM gate convs (layers._conv_cin_padded): zero pad channels
    contribute nothing, so values AND gradients must match the unpadded
    conv exactly.
  * enc0_space_to_depth — enc0 (5x5 stride-2 on the image,
    /root/reference/src/models/train_model.py:500) evaluated as a
    space-to-depth 3x3 stride-1 conv (layers.conv2d_s2d): the same
    multiply-add set, so values/gradients match up to float reduction
    order.

Both are gated at the layer level and end-to-end through the full
rollout loss.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pivp_tpu.config import ModelConfig
from pivp_tpu.models import predictor
from pivp_tpu.ops import layers


def test_conv_cin_padded_matches_unpadded():
    key = jax.random.PRNGKey(0)
    p = layers.conv2d_init(key, 64, 128, 5)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 64))

    def loss_pad(p, x):
        return jnp.sum(jnp.sin(layers.conv2d(p, x, stride=1,
                                             pad_cin_to=128)))

    def loss_ref(p, x):
        return jnp.sum(jnp.sin(layers.conv2d(p, x, stride=1)))

    lp, gp = jax.value_and_grad(loss_pad, argnums=(0, 1))(p, x)
    lr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(lp, lr, rtol=1e-5)
    # the padded conv's primal rounds differently (reduction order);
    # sin/cos amplifies that near cos(y)=0, hence the loose atol
    for a, b in zip(jax.tree_util.tree_leaves(gp),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-4)
    # grad shapes match the UNPADDED parameters
    assert gp[0]["w"].shape == (5, 5, 64, 128)
    assert gp[1].shape == x.shape


def test_conv_cin_padded_noop_when_wide():
    # cin >= pad_to takes the plain path
    p = layers.conv2d_init(jax.random.PRNGKey(0), 128, 32, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 128))
    np.testing.assert_array_equal(
        layers.conv2d(p, x, pad_cin_to=128), layers.conv2d(p, x))


def test_conv2d_s2d_matches_stride2():
    key = jax.random.PRNGKey(2)
    p = layers.conv2d_init(key, 3, 32, 5)
    x = jax.random.normal(jax.random.PRNGKey(3), (2, 16, 16, 3))

    def loss_s2d(p, x):
        return jnp.sum(jnp.sin(layers.conv2d_s2d(p, x)))

    def loss_ref(p, x):
        return jnp.sum(jnp.sin(layers.conv2d(p, x, stride=2)))

    ys, yr = layers.conv2d_s2d(p, x), layers.conv2d(p, x, stride=2)
    assert ys.shape == yr.shape == (2, 8, 8, 32)
    np.testing.assert_allclose(ys, yr, rtol=1e-5, atol=1e-5)

    ls, gs = jax.value_and_grad(loss_s2d, argnums=(0, 1))(p, x)
    lr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(ls, lr, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gs),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-5)


def test_1x1_matmul_matches_conv():
    p = layers.deconv2d_init(jax.random.PRNGKey(0), 64, 14, 1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 64))

    def loss_mm(p, x):
        return jnp.sum(jnp.sin(layers.deconv2d(p, x, stride=1, padding=0,
                                               as_matmul=True)))

    def loss_ref(p, x):
        return jnp.sum(jnp.sin(layers.deconv2d(p, x, stride=1,
                                               padding=0)))

    lm, gm = jax.value_and_grad(loss_mm, argnums=(0, 1))(p, x)
    lr, gr = jax.value_and_grad(loss_ref, argnums=(0, 1))(p, x)
    np.testing.assert_allclose(lm, lr, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(gm),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-4)
    # conv2d takes the same fast path
    pc = layers.conv2d_init(jax.random.PRNGKey(2), 74, 64, 1)
    xc = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 74))
    np.testing.assert_allclose(
        layers.conv2d(pc, xc, stride=1, padding=0, as_matmul=True),
        layers.conv2d(pc, xc, stride=1, padding=0), rtol=1e-5, atol=1e-5)


def test_1x1_hybrid_bwd_matches_conv():
    # "bwd" mode: conv forward (bitwise the plain path), dot backward
    p = layers.deconv2d_init(jax.random.PRNGKey(0), 64, 14, 1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 64))

    def loss(p, x, mode):
        return jnp.sum(jnp.sin(layers.deconv2d(p, x, stride=1, padding=0,
                                               as_matmul=mode)))

    yh = layers.deconv2d(p, x, stride=1, padding=0, as_matmul="bwd")
    yr = layers.deconv2d(p, x, stride=1, padding=0)
    np.testing.assert_array_equal(yh, yr)     # identical forward conv

    lh, gh = jax.value_and_grad(loss, argnums=(0, 1))(p, x, "bwd")
    lr, gr = jax.value_and_grad(loss, argnums=(0, 1))(p, x, False)
    np.testing.assert_allclose(lh, lr, rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(gh),
                    jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-5)


def test_pad_gate_convs_auto_policy():
    from pivp_tpu.config import TrainConfig
    assert TrainConfig(
        pad_gate_convs="0").model_config().pad_gate_convs is False
    assert TrainConfig(
        pad_gate_convs="1").model_config().pad_gate_convs is True
    assert TrainConfig().model_config().pad_gate_convs == "auto"
    with pytest.raises(ValueError):
        ModelConfig(pad_gate_convs="nope")


@pytest.mark.parametrize("flag", ["pad_gate_convs", "enc0_space_to_depth",
                                  "one_by_one_matmul"])
def test_rollout_equivalence_end_to_end(flag):
    base = dict(model_type="CDNA", num_masks=10, sequence_length=4,
                context_frames=2, scheduled_sampling_k=-1,
                image_height=16, image_width=16,
                pad_gate_convs=False)
    cfg0 = ModelConfig(**base)
    cfg1 = ModelConfig(**{**base, flag: True})
    params = predictor.init_params(jax.random.PRNGKey(0), cfg0)
    b = 2
    imgs = jax.random.uniform(jax.random.PRNGKey(1), (4, b, 16, 16, 3))
    acts = jax.random.normal(jax.random.PRNGKey(2), (4, b, 5))
    stas = jax.random.normal(jax.random.PRNGKey(3), (4, b, 5))
    rng = jax.random.PRNGKey(4)

    def loss(p, cfg):
        return predictor.rollout(p, cfg, imgs, acts, stas,
                                 jnp.float32(0.0), rng)["loss"]

    l0, g0 = jax.value_and_grad(loss)(params, cfg0)
    l1, g1 = jax.value_and_grad(loss)(params, cfg1)
    np.testing.assert_allclose(l0, l1, rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(g0),
                     jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(a, b_, rtol=2e-4, atol=1e-5)
