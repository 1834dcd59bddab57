"""Unit tests for core layer primitives (conv / deconv / layernorm / dense)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pivp_tpu.ops import layers


def test_conv2d_shape_and_value():
    key = jax.random.PRNGKey(0)
    p = layers.conv2d_init(key, 3, 8, 5)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 3))
    y = layers.conv2d(p, x, stride=2)  # pad = 5//2 = 2 (chainer convention)
    assert y.shape == (2, 8, 8, 8)

    # Golden check: direct correlation at one output location.
    xp = np.pad(np.asarray(x), ((0, 0), (2, 2), (2, 2), (0, 0)))
    w = np.asarray(p["w"])
    # out[0, 1, 1, 0] reads rows 2*1..2*1+5 of the padded input.
    expected = np.sum(xp[0, 2:7, 2:7, :] * w[..., 0])
    np.testing.assert_allclose(np.asarray(y)[0, 1, 1, 0], expected,
                               rtol=1e-5)


def test_conv2d_stride1_pad1():
    p = layers.conv2d_init(jax.random.PRNGKey(0), 4, 4, 3)
    x = jnp.ones((1, 8, 8, 4))
    y = layers.conv2d(p, x, stride=1)
    assert y.shape == (1, 8, 8, 4)


@pytest.mark.parametrize("in_hw,out_hw", [(8, 16), (16, 32), (32, 64)])
def test_deconv2d_outsize(in_hw, out_hw):
    """Chainer Deconvolution2D outsize semantics: k3 s2 p1, 8->16 etc.
    (reference enc4/enc5/enc6, train_model.py:505-507)."""
    p = layers.deconv2d_init(jax.random.PRNGKey(0), 6, 4, 3)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, in_hw, in_hw, 6))
    y = layers.deconv2d(p, x, stride=2, padding=1, outsize=(out_hw, out_hw))
    assert y.shape == (2, out_hw, out_hw, 4)


def test_deconv2d_is_conv_adjoint():
    """deconv2d(kernel^T) must be the exact vjp of conv2d — the defining
    property of Chainer's Deconvolution2D."""
    kc = jax.random.PRNGKey(0)
    wc = jax.random.normal(kc, (3, 3, 5, 7))  # (kh, kw, in=5, out=7)
    conv_params = {"w": wc, "b": jnp.zeros((7,))}
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 5))

    def f(x):
        return layers.conv2d(conv_params, x, stride=2)  # pad=1 -> (2,8,8,7)

    y, vjp = jax.vjp(f, x)
    ct = jax.random.normal(jax.random.PRNGKey(2), y.shape)
    (x_bar,) = vjp(ct)

    deconv_params = {"w": jnp.transpose(wc, (0, 1, 3, 2)),
                     "b": jnp.zeros((5,))}
    x_bar2 = layers.deconv2d(deconv_params, ct, stride=2, padding=1,
                             outsize=(16, 16))
    np.testing.assert_allclose(np.asarray(x_bar), np.asarray(x_bar2),
                               rtol=1e-4, atol=1e-5)


def test_deconv2d_1x1_equals_dense():
    """1x1 stride-1 deconvs (enc7 / masks heads) are pointwise projections."""
    p = layers.deconv2d_init(jax.random.PRNGKey(0), 8, 3, 1)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 4, 4, 8))
    y = layers.deconv2d(p, x, stride=1, padding=0)
    expected = np.asarray(x) @ np.asarray(p["w"][0, 0]) + np.asarray(p["b"])
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-5)


def test_layer_norm_flat_matches_numpy():
    """LayerNorm over the whole flattened (H, W, C) volume per sample
    (reference LayerNormalizationConv2D, train_model.py:186-208)."""
    shape = (4, 4, 6)
    p = layers.layer_norm_flat_init(shape)
    # Non-trivial affine.
    p = {"scale": p["scale"] * 2.0 + 0.1, "bias": p["bias"] + 0.5}
    x = jax.random.normal(jax.random.PRNGKey(0), (3,) + shape)
    y = layers.layer_norm_flat(p, x, eps=1e-6)

    xn = np.asarray(x).reshape(3, -1)
    mean = xn.mean(axis=1, keepdims=True)
    var = xn.var(axis=1, keepdims=True)
    normed = ((xn - mean) / np.sqrt(var + 1e-6)).reshape(x.shape)
    expected = normed * np.asarray(p["scale"]) + np.asarray(p["bias"])
    np.testing.assert_allclose(np.asarray(y), expected, rtol=1e-4,
                               atol=1e-5)


def test_layer_norm_zero_mean_unit_var():
    p = layers.layer_norm_flat_init((8, 8, 4))
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 8, 8, 4)) * 7 + 3
    y = np.asarray(layers.layer_norm_flat(p, x)).reshape(2, -1)
    np.testing.assert_allclose(y.mean(axis=1), 0.0, atol=1e-4)
    np.testing.assert_allclose(y.var(axis=1), 1.0, atol=1e-3)


def test_dense():
    p = layers.dense_init(jax.random.PRNGKey(0), 10, 4)
    x = jax.random.normal(jax.random.PRNGKey(1), (3, 10))
    y = layers.dense(p, x)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(x) @ np.asarray(p["w"]) + np.asarray(p["b"]),
        rtol=1e-5)
