"""Convolutional LSTM cell, TPU-native functional form.

Mirrors the semantics of the reference's BasicConvLSTMCell
(/root/reference/src/models/train_model.py:216-276): a single fused conv
over concat(input, h) producing 4*out_ch gate channels split in (j, i, f, o)
order, `c = c*sigmoid(f + forget_bias) + sigmoid(i)*tanh(j)`,
`h = tanh(c)*sigmoid(o)`.

Differences by design:
  * stateless/pure — (c, h) is an explicit carry threaded through
    `lax.scan`, not object attributes mutated per call;
  * NHWC layout;
  * the gate conv takes a static `in_ch` (the reference lazily infers it).
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from pivp_tpu.ops import layers


class LSTMState(NamedTuple):
    c: jnp.ndarray  # (B, H, W, out_ch)
    h: jnp.ndarray  # (B, H, W, out_ch)


def conv_lstm_init(key, in_ch: int, out_ch: int, filter_size: int = 5,
                   dtype=jnp.float32) -> Dict[str, jnp.ndarray]:
    """One fused gate conv: concat(x, h) [in_ch+out_ch] -> 4*out_ch
    (reference train_model.py:224, 262-266)."""
    return layers.conv2d_init(key, in_ch + out_ch, 4 * out_ch, filter_size,
                              dtype=dtype)


def zero_state(batch: int, height: int, width: int, out_ch: int,
               dtype=jnp.float32) -> LSTMState:
    """Lazy zero-init of (c, h) in the reference (train_model.py:254-257),
    made explicit here."""
    shape = (batch, height, width, out_ch)
    return LSTMState(jnp.zeros(shape, dtype), jnp.zeros(shape, dtype))


def conv_lstm(params: Dict[str, jnp.ndarray], state: LSTMState,
              x: jnp.ndarray, forget_bias: float = 1.0,
              gate_dtype=jnp.float32,
              pallas_gates: bool = False,
              pad_cin_to: int = 0) -> Tuple[LSTMState, jnp.ndarray]:
    """One ConvLSTM step. Returns (new_state, h).

    `gate_dtype` is the precision of the gate nonlinearities. float32
    (default) matches the reference numerics exactly; under bf16 compute
    the carry is re-quantized to bf16 every step regardless (the conv
    consumes it in compute dtype), so bf16 gate math changes little
    while halving the HBM traffic of the gate fusions — select it with
    ModelConfig.lstm_gate_compute on TPU.

    `pallas_gates=True` runs the whole post-conv gate update as ONE
    Pallas VMEM pass (ops/pallas/lstm_gates.py): f32 register math at
    bf16 I/O traffic — reference-exact gate numerics AND minimal HBM
    traffic simultaneously, so it supersedes the gate_dtype trade-off."""
    c, h = state
    inputs_h = jnp.concatenate([x, h.astype(x.dtype)], axis=-1)
    gates = layers.conv2d(params, inputs_h, stride=1,
                          pad_cin_to=pad_cin_to)
    if pallas_gates:
        from pivp_tpu.ops.pallas import lstm_gates

        new_c, new_h = lstm_gates.fused_lstm_gates(gates, c, forget_bias)
        new_c = new_c.astype(x.dtype)
        new_h = new_h.astype(x.dtype)
        return LSTMState(new_c, new_h), new_h
    # Gate order (j, i, f, o) — reference train_model.py:269.
    j, i, f, o = jnp.split(gates, 4, axis=-1)
    cf = c.astype(gate_dtype)
    new_c = (cf * jax.nn.sigmoid(f.astype(gate_dtype)
                                 + jnp.asarray(forget_bias, gate_dtype))
             + jax.nn.sigmoid(i.astype(gate_dtype))
             * jnp.tanh(j.astype(gate_dtype)))
    new_h = jnp.tanh(new_c) * jax.nn.sigmoid(o.astype(gate_dtype))
    new_c = new_c.astype(x.dtype)
    new_h = new_h.astype(x.dtype)
    return LSTMState(new_c, new_h), new_h
