"""Fused ConvLSTM gate kernel: interpret-mode correctness vs the pure-jnp
reference, forward and VJP, across the model's channel sizes and dtypes.
(The real-TPU compiled path is exercised by tools/check_pallas_tpu.py and
the bench entry.)"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pivp_tpu.ops.pallas import lstm_gates


def _fixtures(C, b=2, h=8, w=8, dtype=jnp.float32, seed=0):
    kg, kc = jax.random.split(jax.random.PRNGKey(seed))
    gates = (jax.random.normal(kg, (b, h, w, 4 * C)) * 1.5).astype(dtype)
    c = (jax.random.normal(kc, (b, h, w, C))).astype(dtype)
    return gates, c


@pytest.mark.parametrize("C", [32, 64, 128])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_forward_matches_reference(C, dtype):
    gates, c = _fixtures(C, dtype=dtype)
    got_c, got_h = lstm_gates.fused_lstm_gates(gates, c, 1.0,
                                               interpret=True)
    want_c, want_h = lstm_gates.fused_lstm_gates_reference(gates, c, 1.0)
    assert got_c.dtype == c.dtype and got_h.dtype == c.dtype
    tol = 1e-6 if dtype == jnp.float32 else 1e-2
    np.testing.assert_allclose(np.float32(got_c), np.float32(want_c),
                               atol=tol, rtol=tol)
    np.testing.assert_allclose(np.float32(got_h), np.float32(want_h),
                               atol=tol, rtol=tol)


@pytest.mark.parametrize("C", [32, 128])
def test_vjp_matches_reference(C):
    gates, c = _fixtures(C, dtype=jnp.float32, seed=3)

    def loss_kernel(g, cc):
        nc, nh = lstm_gates.fused_lstm_gates(g, cc, 1.0, interpret=True)
        return jnp.sum(nc * 0.7 + jnp.sin(nh))

    def loss_ref(g, cc):
        nc, nh = lstm_gates.fused_lstm_gates_reference(g, cc, 1.0)
        return jnp.sum(nc * 0.7 + jnp.sin(nh))

    gk = jax.grad(loss_kernel, argnums=(0, 1))(gates, c)
    gr = jax.grad(loss_ref, argnums=(0, 1))(gates, c)
    for a, b in zip(gk, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


def test_forget_bias_honored():
    gates, c = _fixtures(32)
    c0, h0 = lstm_gates.fused_lstm_gates(gates, c, 0.0, interpret=True)
    c1, h1 = lstm_gates.fused_lstm_gates(gates, c, 5.0, interpret=True)
    assert np.abs(np.asarray(c0) - np.asarray(c1)).max() > 1e-3


def test_conv_lstm_pallas_path_matches_xla():
    """convlstm.conv_lstm(pallas_gates=True) must agree with the XLA path
    (f32 gate math) end to end through the cell."""
    from pivp_tpu.ops import convlstm
    from pivp_tpu.ops.pallas import lstm_gates as lg

    key = jax.random.PRNGKey(0)
    params = convlstm.conv_lstm_init(key, 8, 32)
    x = jax.random.normal(jax.random.fold_in(key, 1), (2, 8, 8, 8))
    state = convlstm.zero_state(2, 8, 8, 32)

    # Monkeypatch the kernel into interpret mode for the CPU test.
    orig = lg.fused_lstm_gates
    lg_interp = functools.partial(orig, interpret=True)
    try:
        lg.fused_lstm_gates = lambda g, c, fb=1.0, interpret=False: \
            orig(g, c, fb, True)
        s_p, h_p = convlstm.conv_lstm(params, state, x, 1.0,
                                      pallas_gates=True)
    finally:
        lg.fused_lstm_gates = orig
    s_x, h_x = convlstm.conv_lstm(params, state, x, 1.0,
                                  gate_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(h_p), np.asarray(h_x),
                               atol=1e-6, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(s_p.c), np.asarray(s_x.c),
                               atol=1e-6, rtol=1e-6)


def test_rejects_mismatched_channels():
    gates, c = _fixtures(32)
    with pytest.raises(ValueError, match="4"):
        lstm_gates.fused_lstm_gates(gates[..., :96], c, 1.0,
                                    interpret=True)
