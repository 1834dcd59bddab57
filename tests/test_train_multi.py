"""Tests for multi-step-per-dispatch training and the NaN failure guard."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy

from pivp_tpu.config import ModelConfig, TrainConfig
from pivp_tpu.data import dataset as dataset_lib
from pivp_tpu.data import synthetic
from pivp_tpu.parallel import train_step as ts_lib


def tiny_cfg(**kw):
    base = dict(image_height=16, image_width=16, sequence_length=4,
                context_frames=2, num_masks=3)
    base.update(kw)
    return ModelConfig(**base)


def test_multi_matches_sequential_single_steps():
    """K steps in one dispatch must equal K sequential single-step calls
    (same batches, same per-step rng via fold_in)."""
    cfg = tiny_cfg(scheduled_sampling_k=-1.0)  # rng-independent path
    opt = ts_lib.make_optimizer(1e-3)
    k, b = 3, 4

    imgs, acts, stas = synthetic.generate_sequences(b * k, 4, 16, 16)
    per_step = [
        dataset_lib.to_time_major(imgs[i * b:(i + 1) * b],
                                  acts[i * b:(i + 1) * b],
                                  stas[i * b:(i + 1) * b])
        for i in range(k)]
    stacked = tuple(np.stack([s[i] for s in per_step]) for i in range(3))

    rng = jax.random.PRNGKey(5)

    state1 = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = ts_lib.make_train_step(cfg, opt, mesh=None)
    losses_seq = []
    for i in range(k):
        state1, m = step(state1, per_step[i], jnp.float32(i),
                         jax.random.fold_in(rng, i))
        losses_seq.append(float(m["loss"]))

    state2 = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    multi = ts_lib.make_train_multi(cfg, opt, mesh=None)
    state2, m2 = multi(state2, stacked, jnp.float32(0.0), rng)

    np.testing.assert_allclose(np.asarray(m2["loss"]), losses_seq,
                               rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(state1.params),
                     jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6)


def test_loop_with_steps_per_call(tmp_path):
    from pivp_tpu.training import loop

    arrays = synthetic.generate_sequences(8, 4, 16, 16)
    cfg = TrainConfig(
        num_iterations=6, batch_size=4, sequence_length=4,
        context_frames=2, num_masks=3, train_val_split=1.0,
        validation_interval=100, save_interval=100,
        output_dir=str(tmp_path), image_height=16, image_width=16,
        steps_per_call=3)
    result = loop.run_training(cfg, arrays=arrays)
    assert result["global_losses"].shape[0] >= 1
    files = os.listdir(result["save_dir"])
    assert any(f.startswith("training-final") for f in files)


def test_multi_k_real_masks_padded_steps():
    """A dispatch padded past k_real must apply EXACTLY k_real updates:
    params, opt_state and step match the sequential k_real-step result,
    regardless of what the padded tail batches contain."""
    cfg = tiny_cfg(scheduled_sampling_k=-1.0)
    opt = ts_lib.make_optimizer(1e-3)
    k_compiled, k_real, b = 4, 2, 4

    imgs, acts, stas = synthetic.generate_sequences(b * k_real, 4, 16, 16)
    per_step = [
        dataset_lib.to_time_major(imgs[i * b:(i + 1) * b],
                                  acts[i * b:(i + 1) * b],
                                  stas[i * b:(i + 1) * b])
        for i in range(k_real)]
    # Pad with garbage-valued repeats of the last batch.
    padded = per_step + [per_step[-1]] * (k_compiled - k_real)
    stacked = tuple(np.stack([s[i] for s in padded]) for i in range(3))

    rng = jax.random.PRNGKey(11)
    state1 = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = ts_lib.make_train_step(cfg, opt, mesh=None)
    losses_seq = []
    for i in range(k_real):
        state1, m = step(state1, per_step[i], jnp.float32(i),
                         jax.random.fold_in(rng, i))
        losses_seq.append(float(m["loss"]))

    state2 = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    multi = ts_lib.make_train_multi(cfg, opt, mesh=None)
    state2, m2 = multi(state2, stacked, jnp.float32(0.0), rng,
                       k_real=k_real)

    assert int(state2.step) == k_real
    np.testing.assert_allclose(np.asarray(m2["loss"])[:k_real],
                               losses_seq, rtol=1e-5)
    for a, b_ in zip(jax.tree_util.tree_leaves(state1.params),
                     jax.tree_util.tree_leaves(state2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(state1.opt_state),
                     jax.tree_util.tree_leaves(state2.opt_state)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=1e-4, atol=1e-6)


def test_epoch_stats_invariant_to_steps_per_call(tmp_path):
    """Per-epoch loss stats must be IDENTICAL for steps_per_call 1 vs 7
    on a 5-batch epoch (boundaries fall mid-dispatch, the final dispatch
    is short): the exact-segmentation bookkeeping regression test."""
    from pivp_tpu.training import loop

    arrays = synthetic.generate_sequences(20, 4, 16, 16)

    def run(spc, tag):
        cfg = TrainConfig(
            num_iterations=17, batch_size=4, sequence_length=4,
            context_frames=2, num_masks=3, train_val_split=1.0,
            validation_interval=100, save_interval=100,
            output_dir=str(tmp_path / tag), image_height=16,
            image_width=16, steps_per_call=spc, prefetch=0,
            schedsamp_k=-1.0)  # rng-independent path
        out = loop.run_training(cfg, arrays=arrays)
        return np.asarray(out["global_losses"])

    a = run(1, "k1")
    b = run(7, "k7")
    # 17 iterations over 5-batch epochs -> exactly 3 complete epochs.
    assert a.shape == b.shape == (3, 5)
    np.testing.assert_allclose(a, b, rtol=1e-5)


def test_nan_guard_aborts_and_checkpoints(tmp_path):
    from pivp_tpu.training import loop

    arrays = synthetic.generate_sequences(8, 4, 16, 16)
    cfg = TrainConfig(
        num_iterations=4, batch_size=4, sequence_length=4,
        context_frames=2, num_masks=3, train_val_split=1.0,
        validation_interval=100, save_interval=100,
        output_dir=str(tmp_path), image_height=16, image_width=16,
        learning_rate=1e18)  # guaranteed divergence
    with pytest.raises(FloatingPointError):
        loop.run_training(cfg, arrays=arrays)
    runs = os.listdir(tmp_path)
    assert runs, "emergency checkpoint dir missing"
    files = os.listdir(os.path.join(tmp_path, runs[0]))
    assert any("nan-epoch" in f for f in files)


def test_prefetch_is_bit_identical(tmp_path):
    """The prefetch thread must not change anything: same batch order,
    same rng stream, identical loss curves with prefetch 0 vs 2, for both
    dispatch granularities."""
    from pivp_tpu.training import loop

    arrays = synthetic.generate_sequences(10, 4, 16, 16)

    def run(prefetch, steps_per_call, tag):
        cfg = TrainConfig(
            num_iterations=7, batch_size=4, sequence_length=4,
            context_frames=2, num_masks=3, train_val_split=0.8,
            validation_interval=2, save_interval=100,
            output_dir=str(tmp_path / tag), image_height=16,
            image_width=16, steps_per_call=steps_per_call,
            prefetch=prefetch)
        out = loop.run_training(cfg, arrays=arrays)
        return np.asarray(out["global_losses"])

    for spc in (1, 3):
        a = run(0, spc, f"off{spc}")
        b = run(2, spc, f"on{spc}")
        np.testing.assert_array_equal(a, b)


def test_grad_accum_matches_full_batch():
    """grad_accum=G must produce the same parameter update as the full-
    batch step (the loss is a batch mean, so averaging microbatch
    gradients is exact). Uses feed-self rollout (schedsamp -1) so the
    sampling rng cannot differ between the two paths."""
    cfg = tiny_cfg(scheduled_sampling_k=-1.0)
    opt = ts_lib.make_optimizer(1e-3)
    b = 8

    imgs, acts, stas = synthetic.generate_sequences(b, 4, 16, 16)
    batch = dataset_lib.to_time_major(imgs, acts, stas)
    rng = jax.random.PRNGKey(9)

    state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)

    @jax.jit
    def grads_full(params):
        return ts_lib._grads_and_metrics(params, cfg, batch,
                                         jnp.float32(0.0), rng,
                                         remat=False, grad_accum=1)

    @jax.jit
    def grads_acc(params):
        return ts_lib._grads_and_metrics(params, cfg, batch,
                                         jnp.float32(0.0), rng,
                                         remat=False, grad_accum=4)

    g_full, m_full = grads_full(state.params)
    g_acc, m_acc = grads_acc(state.params)

    np.testing.assert_allclose(float(m_acc["loss"]),
                               float(m_full["loss"]), rtol=1e-5)
    # Gradients must agree to float reassociation noise (summing G
    # quarter-batch reductions vs one full-batch reduction). Post-Adam
    # params are NOT compared tightly: eps=1e-8 rsqrt amplifies this
    # noise unboundedly for near-zero second moments.
    for a, b_ in zip(jax.tree_util.tree_leaves(g_full),
                     jax.tree_util.tree_leaves(g_acc)):
        scale = float(np.max(np.abs(np.asarray(a)))) + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b_) / scale,
                                   rtol=1e-4, atol=1e-5)


def test_grad_accum_unroll_matches_scan():
    """`grad_accum_unroll` only changes the SCHEDULE (unrolled
    independent microbatch branches vs a sequential scan); the math is
    identical, so gradients and metrics agree to compiler-fusion
    reassociation noise (the unrolled bodies fuse into the surrounding
    graph differently than the once-compiled scan body)."""
    cfg = tiny_cfg()
    opt = ts_lib.make_optimizer(1e-3)
    b = 8

    imgs, acts, stas = synthetic.generate_sequences(b, 4, 16, 16)
    batch = dataset_lib.to_time_major(imgs, acts, stas)
    rng = jax.random.PRNGKey(9)
    state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)

    def grads(unroll):
        return jax.jit(lambda p: ts_lib._grads_and_metrics(
            p, cfg, batch, jnp.float32(0.0), rng, remat=False,
            grad_accum=4, grad_accum_unroll=unroll))(state.params)

    g_scan, m_scan = grads(False)
    g_unr, m_unr = grads(True)
    np.testing.assert_allclose(float(m_unr["loss"]),
                               float(m_scan["loss"]), rtol=1e-6)
    for a, b_ in zip(jax.tree_util.tree_leaves(g_scan),
                     jax.tree_util.tree_leaves(g_unr)):
        scale = float(np.max(np.abs(np.asarray(a)))) + 1e-12
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b_) / scale,
                                   rtol=1e-5, atol=1e-6)


def test_grad_accum_rejects_indivisible_batch():
    cfg = tiny_cfg(scheduled_sampling_k=-1.0)
    opt = ts_lib.make_optimizer(1e-3)
    imgs, acts, stas = synthetic.generate_sequences(6, 4, 16, 16)
    batch = dataset_lib.to_time_major(imgs, acts, stas)
    state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = ts_lib.make_train_step(cfg, opt, mesh=None, grad_accum=4)
    with pytest.raises(ValueError, match="divisible"):
        step(state, batch, jnp.float32(0.0), jax.random.PRNGKey(0))


def test_prefetch_thread_retired_after_nan_abort(tmp_path):
    """An aborting run (nan guard) must not leave the prefetch producer
    blocked on its queue pinning staged device buffers."""
    import gc
    import threading
    import time

    from pivp_tpu.training import loop

    arrays = synthetic.generate_sequences(8, 4, 16, 16)
    cfg = TrainConfig(
        num_iterations=40, batch_size=4, sequence_length=4,
        context_frames=2, num_masks=3, train_val_split=1.0,
        validation_interval=100, save_interval=100,
        output_dir=str(tmp_path), image_height=16, image_width=16,
        steps_per_call=3, prefetch=2,
        learning_rate=1e18)  # guaranteed divergence
    with pytest.raises(FloatingPointError):
        loop.run_training(cfg, arrays=arrays)
    gc.collect()
    deadline = time.time() + 10.0
    while time.time() < deadline:
        alive = [t for t in threading.enumerate()
                 if t.name == "pivp-input-prefetch" and t.is_alive()]
        if not alive:
            break
        time.sleep(0.2)
    assert not alive, "prefetch producer still alive after abort"
