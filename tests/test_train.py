import pytest

pytestmark = pytest.mark.heavy

"""End-to-end training tests: sharded train step on the virtual 8-device
CPU mesh, loss decrease on synthetic data, checkpoint round-trip."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from pivp_tpu.config import ModelConfig, TrainConfig
from pivp_tpu.data import dataset as dataset_lib
from pivp_tpu.data import synthetic
from pivp_tpu.parallel import mesh as mesh_lib
from pivp_tpu.parallel import train_step as ts_lib
from pivp_tpu.utils import checkpoint as ckpt_lib


def tiny_cfg(**kw):
    base = dict(image_height=16, image_width=16, sequence_length=4,
                context_frames=2, num_masks=3)
    base.update(kw)
    return ModelConfig(**base)


def make_batch(cfg, batch=8, key=0):
    imgs, acts, stas = synthetic.generate_sequences(
        batch, cfg.sequence_length, cfg.image_height, cfg.image_width,
        seed=key)
    return dataset_lib.to_time_major(imgs, acts, stas)


def test_train_step_on_8_device_mesh():
    """Full train step sharded over the virtual 8-CPU mesh: batch split on
    the data axis, params replicated, gradients psum'd by GSPMD."""
    assert len(jax.devices()) == 8
    cfg = tiny_cfg()
    mesh = mesh_lib.make_mesh()
    opt = ts_lib.make_optimizer(1e-3)
    state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = ts_lib.make_train_step(cfg, opt, mesh)

    batch = mesh_lib.shard_batch(mesh, make_batch(cfg, batch=8))
    state2, metrics = step(state, batch, jnp.float32(0.0),
                           jax.random.PRNGKey(1))
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["loss"]))
    # Params must have changed.
    diff = sum(float(jnp.sum(jnp.abs(a - b))) for a, b in zip(
        jax.tree_util.tree_leaves(state2.params),
        jax.tree_util.tree_leaves(
            ts_lib.create_train_state(jax.random.PRNGKey(0), cfg,
                                      opt).params)))
    assert diff > 0


def test_sharded_step_matches_single_device():
    """The 8-way sharded step must produce the same loss and updated
    params as the unsharded one (GSPMD correctness gate)."""
    cfg = tiny_cfg()
    opt = ts_lib.make_optimizer(1e-3)
    batch = make_batch(cfg, batch=8)

    state1 = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step1 = ts_lib.make_train_step(cfg, opt, mesh=None)
    s1, m1 = step1(state1, batch, jnp.float32(0.0), jax.random.PRNGKey(1))

    mesh = mesh_lib.make_mesh()
    state2 = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step2 = ts_lib.make_train_step(cfg, opt, mesh)
    s2, m2 = step2(state2, mesh_lib.shard_batch(mesh, batch),
                   jnp.float32(0.0), jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-5)


def test_loss_decreases_on_synthetic():
    """Smoke train: 30 steps on synthetic sequences must reduce the loss
    (the reference's de-facto quality gate is its notebook loss tables)."""
    cfg = tiny_cfg(scheduled_sampling_k=-1.0)
    mesh = mesh_lib.make_mesh()
    opt = ts_lib.make_optimizer(3e-3)
    state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = ts_lib.make_train_step(cfg, opt, mesh)

    batch = mesh_lib.shard_batch(mesh, make_batch(cfg, batch=8))
    losses = []
    for i in range(30):
        state, metrics = step(state, batch, jnp.float32(i),
                              jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.7, losses


def test_checkpoint_roundtrip(tmp_path):
    cfg = tiny_cfg()
    opt = ts_lib.make_optimizer(1e-3)
    state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    path = str(tmp_path / "params.npz")
    ckpt_lib.save_npz(path, state.params)

    other = ts_lib.create_train_state(jax.random.PRNGKey(7), cfg, opt)
    restored = ckpt_lib.load_npz_into(path, other.params)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))

    keys = ckpt_lib.npz_keys(path)
    assert "enc0/w" in keys and "head/cdna_kerns/w" in keys


def test_run_training_loop(tmp_path):
    """Full driver: epochs, validation, checkpoints, curves."""
    from pivp_tpu.training import loop

    arrays = synthetic.generate_sequences(10, 4, 16, 16)
    cfg = TrainConfig(
        num_iterations=6, batch_size=4, sequence_length=4,
        context_frames=2, num_masks=3, model_type="CDNA",
        train_val_split=0.8, validation_interval=1, save_interval=1,
        output_dir=str(tmp_path), learning_rate=1e-3,
        image_height=16, image_width=16)

    result = loop.run_training(cfg, arrays=arrays)
    save_dir = result["save_dir"]
    assert os.path.exists(os.path.join(save_dir, "version"))
    files = os.listdir(save_dir)
    assert any(f.startswith("training-final") for f in files)
    assert "training-global_losses.npy" in files
    assert "training-global_psnr_all_valid.npy" in files
    curves = np.load(os.path.join(save_dir, "training-global_losses.npy"))
    assert curves.shape[1] == 5  # [mean, std, min, max, median]


def test_validation_invariant_to_batch_size():
    """Padded duplicate rows in the final partial eval batch must not bias
    validation metrics: the exact sweep aggregation gives identical
    numbers for any batch size (regression for the per-batch-mean bias)."""
    from pivp_tpu.training import loop

    cfg = tiny_cfg()
    opt = ts_lib.make_optimizer(1e-3)
    state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    eval_step = ts_lib.make_eval_step(cfg, None)
    val_arrays = synthetic.generate_sequences(7, cfg.sequence_length,
                                              cfg.image_height,
                                              cfg.image_width, seed=5)

    v3 = loop.run_validation(eval_step, state.params, val_arrays,
                             batch_size=3, state_cost_weight=1e-4)
    v7 = loop.run_validation(eval_step, state.params, val_arrays,
                             batch_size=7, state_cost_weight=1e-4)
    assert v3["n_sequences"] == v7["n_sequences"] == 7
    for key in ("loss", "psnr_all", "psnr_per_image", "ssim"):
        assert abs(v3[key] - v7[key]) < 1e-4 * max(1.0, abs(v7[key])), \
            (key, v3[key], v7[key])


def test_orbax_checkpointer_save_and_resume(tmp_path):
    """--checkpointer orbax: step-managed TrainState checkpoints are
    written alongside the npz artifacts, and re-running the same run
    name auto-resumes from the latest step instead of restarting."""
    from pivp_tpu.training import loop
    from pivp_tpu.utils import orbax_ckpt

    assert orbax_ckpt.available()
    arrays = synthetic.generate_sequences(8, 4, 16, 16)
    base = dict(
        batch_size=4, sequence_length=4, context_frames=2, num_masks=3,
        model_type="CDNA", train_val_split=1.0, validation_interval=100,
        save_interval=1, output_dir=str(tmp_path), learning_rate=1e-3,
        image_height=16, image_width=16, checkpointer="orbax")

    cfg = TrainConfig(num_iterations=4, **base)
    r1 = loop.run_training(cfg, arrays=arrays, run_name="resume-run")
    assert int(r1["state"].step) == 4
    orbax_dir = os.path.join(r1["save_dir"], "orbax")
    assert os.path.isdir(orbax_dir)

    # Restore directly: latest step holds the final state.
    mgr = orbax_ckpt.make_manager(orbax_dir)
    assert mgr.latest_step() == 4
    restored = orbax_ckpt.restore(mgr, r1["state"])
    a = jax.tree_util.tree_leaves(restored.params)[0]
    b = jax.tree_util.tree_leaves(r1["state"].params)[0]
    assert np.allclose(np.asarray(a), np.asarray(b))

    # Resume: same run_name, higher iteration budget -> continues from 4.
    cfg2 = TrainConfig(num_iterations=7, **base)
    r2 = loop.run_training(cfg2, arrays=arrays, run_name="resume-run")
    assert int(r2["state"].step) == 7


def test_sharded_grad_accum_matches_single_device():
    """grad_accum composed with dp sharding: the microbatch reshape
    splits the sharded batch axis (T, B) -> (G, T, B/G); GSPMD must keep
    each microbatch sharded over data and produce the same loss/params
    as the unsharded accumulated step."""
    cfg = tiny_cfg(scheduled_sampling_k=-1.0)
    opt = ts_lib.make_optimizer(1e-3)
    batch = make_batch(cfg, batch=16)

    state1 = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step1 = ts_lib.make_train_step(cfg, opt, mesh=None, grad_accum=2)
    s1, m1 = step1(state1, batch, jnp.float32(0.0), jax.random.PRNGKey(1))

    mesh = mesh_lib.make_mesh()
    state2 = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step2 = ts_lib.make_train_step(cfg, opt, mesh, grad_accum=2)
    s2, m2 = step2(state2, mesh_lib.shard_batch(mesh, batch),
                   jnp.float32(0.0), jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-5)
