"""Producer-side HBM staging is gated by an explicit byte budget.

With prefetch, up to (prefetch+1) assembled payloads can be device-
resident at once; a payload larger than the budget must be yielded as
HOST arrays (transfer-on-dequeue) instead of being device_put on the
producer thread — RESOURCE_EXHAUSTED prevention by code, not by the
loop.py staging comment.
"""

import jax
import numpy as np

from pivp_tpu.config import TrainConfig
from pivp_tpu.data import dataset as dataset_lib
from pivp_tpu.data import synthetic
from pivp_tpu.parallel import mesh as mesh_lib
from pivp_tpu.training import loop


def _produce_one(cfg, monkeypatch, budget_mb):
    monkeypatch.setenv("PIVP_STAGING_BUDGET_MB", str(budget_mb))
    arrays = synthetic.generate_sequences(8, 4, 16, 16)
    batcher = dataset_lib.EpochBatcher(arrays, cfg.batch_size, seed=0)
    mesh = mesh_lib.make_mesh(devices=jax.devices()[:1])
    gen = loop._produce_calls(batcher, cfg, 0, mesh,
                              steps_per_call=cfg.steps_per_call)
    payload, k, marks = next(gen)
    gen.close()
    return payload


def _cfg(**kw):
    return TrainConfig(num_iterations=4, batch_size=4, sequence_length=4,
                       context_frames=2, num_masks=3, image_height=16,
                       image_width=16, u8_transfer=True, prefetch=2, **kw)


def test_within_budget_stages_on_device(monkeypatch):
    payload = _produce_one(_cfg(steps_per_call=2), monkeypatch,
                           budget_mb=2048)
    assert all(isinstance(a, jax.Array) for a in payload)


def test_over_budget_falls_back_to_host(monkeypatch):
    # Budget 0 MB: every payload is over budget -> host arrays out.
    payload = _produce_one(_cfg(steps_per_call=2), monkeypatch,
                           budget_mb=0)
    assert all(isinstance(a, np.ndarray) for a in payload)


def test_single_step_path_over_budget(monkeypatch):
    payload = _produce_one(_cfg(steps_per_call=1), monkeypatch,
                           budget_mb=0)
    assert all(isinstance(a, np.ndarray) for a in payload)


def test_over_budget_training_still_runs(monkeypatch, tmp_path):
    """A huge-payload config must still train correctly (transfer on
    dequeue), bit-identical metrics aside from timing."""
    monkeypatch.setenv("PIVP_STAGING_BUDGET_MB", "0")
    arrays = synthetic.generate_sequences(8, 4, 16, 16)
    cfg = _cfg(steps_per_call=2, output_dir=str(tmp_path),
               train_val_split=0.75, validation_interval=100,
               save_interval=100)
    result = loop.run_training(cfg, arrays=arrays)
    assert np.isfinite(result["global_losses"]).all()
