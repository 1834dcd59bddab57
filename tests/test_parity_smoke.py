"""FAST-tier oracle-parity smoke (runs in the default `make test`).

The full parity gates (tests/test_reference_parity*.py, 18 tests at
64x64/T=10) are heavy-tier and run at the builder's discretion — which
left the converter mapping and the literal-quirk semantics with zero
per-commit oracle coverage. This smoke closes that: reduced geometry
(16x16, T=4, B=2, CDNA, f64) through the SAME machinery — fixture params
exported via `export_reference_npz` into the torch oracle, one reference
training step, loss + every parameter gradient compared in the Chainer
npz layout. Any regression in the converter permutations, the trunk/head
semantics, the literal-quirk flags, or the backward pass fails here
within a minute.
"""

import dataclasses

import numpy as np

from pivp_tpu.config import ModelConfig
from pivp_tpu.utils.checkpoint import export_reference_npz

from chainer_oracle import ChainerOracle
from test_reference_parity import _fixture_params
from test_reference_parity_train import (_assert_grads_close, _grad_table,
                                         _jax_grads)

T, B, H, W = 4, 2, 16, 16


def _small_batch(seed: int = 3):
    rng = np.random.RandomState(seed)
    images = rng.uniform(0.0, 1.0, (T, B, H, W, 3)).astype(np.float32)
    actions = rng.uniform(-1.0, 1.0, (T, B, 5)).astype(np.float32)
    states = rng.uniform(-1.0, 1.0, (T, B, 5)).astype(np.float32)
    return images, actions, states


def test_cdna_train_step_parity_smoke(tmp_path):
    """f64 CDNA literal-quirk mode, feedself sampling: loss < 1e-9 and
    every parameter gradient < 1e-6 rel Frobenius vs the torch oracle."""
    cfg = ModelConfig(model_type="CDNA", num_masks=4,
                      sequence_length=T, context_frames=2,
                      image_height=H, image_width=W,
                      scheduled_sampling_k=-1.0,
                      chainer_mask_scramble=True, stp_shared_params=True,
                      compute_dtype="float64",
                      lstm_gate_compute="compute")
    params = _fixture_params(dataclasses.replace(
        cfg, compute_dtype="float32"))
    batch = _small_batch()
    images, actions, states = batch

    ckpt = str(tmp_path / "ref_layout.npz")
    export_reference_npz(ckpt, cfg, params)
    oracle = ChainerOracle(ckpt, model_type="CDNA",
                           num_masks=cfg.num_masks, use_state=True,
                           context_frames=cfg.context_frames,
                           literal_quirks=True)
    ref = oracle.train_step(np.transpose(images, (0, 1, 4, 2, 3)),
                            actions, states, sampling="feedself")

    grads, loss = _jax_grads(cfg, params, batch, 0.0, x64=True)
    assert abs(loss - ref["loss"]) < 1e-9 * max(1.0, abs(ref["loss"]))

    jax_grads = _grad_table(cfg, grads, tmp_path)
    assert set(ref["grads"].keys()) == set(jax_grads.keys())
    _assert_grads_close(ref["grads"], jax_grads, rtol=1e-6,
                        label="smoke:CDNA")
