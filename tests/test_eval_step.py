"""The validation step runs a TRIMMED program (VERDICT r3 #3): the eval
jit returns only the metric matrices validation reads, letting XLA
dead-code-eliminate the generated-video outputs — and, on multi-host
meshes where eval outputs are replicated, stopping a per-batch
all-gather of the entire (T-1,B,H,W,C) rollout nobody consumes."""

import jax

from pivp_tpu.data import synthetic
from pivp_tpu.parallel import train_step as ts_lib
from pivp_tpu.training import loop
from test_train import make_batch, tiny_cfg


def _setup():
    cfg = tiny_cfg()
    opt = ts_lib.make_optimizer(1e-3)
    state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    return cfg, state


def test_eval_step_returns_only_metric_keys():
    cfg, state = _setup()
    batch = make_batch(cfg, batch=4)
    out = ts_lib.make_eval_step(cfg, None)(state.params, batch,
                                           jax.random.PRNGKey(0))
    assert set(out) == set(ts_lib._EVAL_METRIC_KEYS)
    assert set(out) == {"recon_mse_tb", "state_mse_tb", "ssim_tb"}


def test_eval_step_keys_none_is_the_full_rollout():
    """The inference path asks for everything (keys=None)."""
    cfg, state = _setup()
    batch = make_batch(cfg, batch=4)
    out = ts_lib.make_eval_step(cfg, None, keys=None)(
        state.params, batch, jax.random.PRNGKey(0))
    assert {"gen_images", "gen_states", "recon_mse_tb"} <= set(out)


def test_validation_numbers_unchanged_by_trimming():
    """Trimmed vs full-rollout eval programs give bit-identical
    validation metrics — the selection is pure DCE."""
    cfg, state = _setup()
    val_arrays = synthetic.generate_sequences(
        5, cfg.sequence_length, cfg.image_height, cfg.image_width,
        seed=11)
    trimmed = loop.run_validation(
        ts_lib.make_eval_step(cfg, None), state.params, val_arrays,
        batch_size=4, state_cost_weight=1e-4)
    full = loop.run_validation(
        ts_lib.make_eval_step(cfg, None, keys=None), state.params,
        val_arrays, batch_size=4, state_cost_weight=1e-4)
    assert trimmed == full
