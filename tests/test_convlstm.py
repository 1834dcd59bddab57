"""Unit tests for the ConvLSTM cell."""

import jax
import jax.numpy as jnp
import numpy as np

from pivp_tpu.ops import convlstm, layers


def test_shapes_and_carry():
    p = convlstm.conv_lstm_init(jax.random.PRNGKey(0), in_ch=4, out_ch=8)
    assert p["w"].shape == (5, 5, 4 + 8, 4 * 8)
    st = convlstm.zero_state(2, 16, 16, 8)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 16, 16, 4))
    st2, h = convlstm.conv_lstm(p, st, x)
    assert h.shape == (2, 16, 16, 8)
    assert st2.c.shape == (2, 16, 16, 8)
    # State must actually evolve.
    assert not np.allclose(np.asarray(st2.h), 0.0)


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def test_gate_math_matches_reference_formula():
    """c' = c*sig(f + bias) + sig(i)*tanh(j); h' = tanh(c')*sig(o) with
    gate split order (j, i, f, o) — reference train_model.py:269-272."""
    out_ch = 2
    p = convlstm.conv_lstm_init(jax.random.PRNGKey(0), in_ch=3,
                                out_ch=out_ch, filter_size=3)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 4, 4, 3))
    c0 = jax.random.normal(jax.random.PRNGKey(2), (1, 4, 4, out_ch))
    h0 = jax.random.normal(jax.random.PRNGKey(3), (1, 4, 4, out_ch))

    st, h = convlstm.conv_lstm(p, convlstm.LSTMState(c0, h0), x,
                               forget_bias=1.0)

    gates = np.asarray(layers.conv2d(p, jnp.concatenate([x, h0], -1)))
    j, i, f, o = np.split(gates, 4, axis=-1)
    c_exp = (np.asarray(c0) * _sigmoid(f + 1.0)
             + _sigmoid(i) * np.tanh(j))
    h_exp = np.tanh(c_exp) * _sigmoid(o)
    np.testing.assert_allclose(np.asarray(st.c), c_exp, rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(h), h_exp, rtol=1e-4, atol=1e-5)


def test_forget_bias_saturates():
    """With a huge forget bias the cell preserves its memory."""
    p = convlstm.conv_lstm_init(jax.random.PRNGKey(0), 2, 2, 3)
    p = {"w": p["w"] * 0.0, "b": p["b"]}  # zero weights: gates = bias = 0
    c0 = jnp.full((1, 4, 4, 2), 3.0)
    st, _ = convlstm.conv_lstm(p, convlstm.LSTMState(c0, jnp.zeros_like(c0)),
                               jnp.zeros((1, 4, 4, 2)), forget_bias=100.0)
    # sig(100) ~ 1, sig(0)*tanh(0) = 0 -> c unchanged.
    np.testing.assert_allclose(np.asarray(st.c), 3.0, rtol=1e-5)
