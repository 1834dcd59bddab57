"""Deterministic resume + graceful preemption.

Covers the round-3 production-training additions:
  * EpochBatcher.seek — fast-forwarding the shuffle/epoch state is
    bit-identical to replaying the draws;
  * per-step sampling keys are fold_in(base, ABSOLUTE iteration), so the
    scheduled-sampling stream is invariant to steps_per_call grouping
    (here in an rng-SENSITIVE regime, unlike the schedsamp_k=-1
    bookkeeping tests) and to checkpoint/resume boundaries;
  * orbax auto-resume reproduces the uninterrupted run exactly
    (params bit-equal), including a mid-epoch resume point, and carries
    the prior epoch curves forward;
  * graceful preemption (training/preemption.py): checkpoint at the
    next dispatch boundary, clean exit, exact continuation.

No reference equivalent: the reference restarts data order from scratch
and loses everything since the last epoch save
(/root/reference/src/models/train_model.py:862-869, 1023-1041).
"""

import os
import signal

import numpy as np
import pytest

from pivp_tpu.config import TrainConfig
from pivp_tpu.data import dataset as dataset_lib
from pivp_tpu.data import synthetic
from pivp_tpu.training import preemption


def _dummy_arrays(n, t=4):
    imgs = np.zeros((n, t, 8, 8, 3), np.float32)
    acts = np.zeros((n, t, 5), np.float32)
    stas = np.zeros((n, t, 5), np.float32)
    return imgs, acts, stas


@pytest.mark.parametrize("n,b", [(10, 4), (7, 3), (3, 8), (16, 16),
                                 (5, 5)])
def test_seek_matches_replay(n, b):
    for drawn in (0, 1, 3, 7, 20):
        ref = dataset_lib.EpochBatcher(_dummy_arrays(n), b, seed=11)
        for _ in range(drawn):
            ref.next_indices()
        fwd = dataset_lib.EpochBatcher(_dummy_arrays(n), b, seed=11)
        fwd.seek(drawn)
        assert fwd.epoch == ref.epoch, (n, b, drawn)
        # The NEXT batches must be identical (state equivalence).
        for _ in range(4):
            np.testing.assert_array_equal(fwd.next_indices(),
                                          ref.next_indices())
            assert fwd.epoch == ref.epoch
            assert fwd.is_new_epoch == ref.is_new_epoch


def test_seek_composes():
    ref = dataset_lib.EpochBatcher(_dummy_arrays(6), 4, seed=3)
    ref.seek(9)
    two = dataset_lib.EpochBatcher(_dummy_arrays(6), 4, seed=3)
    two.seek(4)
    two.next_indices()            # mixed seek + draw
    two.seek(4)
    np.testing.assert_array_equal(two.next_indices(), ref.next_indices())
    assert two.epoch == ref.epoch


def test_hostsharded_batcher_seek():
    from pivp_tpu.parallel import multihost

    arrays = _dummy_arrays(8)
    ref = multihost.HostShardedBatcher(arrays, 4, seed=7,
                                       process_index=1, process_count=2)
    for _ in range(5):
        ref.next_indices()
    fwd = multihost.HostShardedBatcher(arrays, 4, seed=7,
                                       process_index=1, process_count=2)
    fwd.seek(5)
    np.testing.assert_array_equal(fwd.next_indices(), ref.next_indices())
    assert fwd.epoch == ref.epoch


def _loop_cfg(tmp_path, tag, **kw):
    base = dict(
        num_iterations=6, batch_size=4, sequence_length=4,
        context_frames=2, num_masks=3, train_val_split=1.0,
        validation_interval=100, save_interval=100,
        output_dir=str(tmp_path / tag), event_log_dir="",
        image_height=16, image_width=16, steps_per_call=1,
        # rng-SENSITIVE scheduled sampling: num_ground_truth is
        # mid-range, so WHICH batch rows feed back depends on the
        # per-step key — the regime where key-derivation bugs show.
        schedsamp_k=10.0)
    base.update(kw)
    return TrainConfig(**base)


def _params_leaves(out):
    import jax

    return [np.asarray(x) for x in
            jax.tree_util.tree_leaves(out["state"].params)]


@pytest.mark.heavy
def test_losses_invariant_to_steps_per_call_rng_sensitive(tmp_path):
    """fold_in(base, absolute_step) keys: K=1 and K=3 must produce the
    SAME training trajectory even when sampling rng matters."""
    from pivp_tpu.training import loop

    arrays = synthetic.generate_sequences(8, 4, 16, 16)
    a = loop.run_training(_loop_cfg(tmp_path, "k1", steps_per_call=1),
                          arrays=arrays)
    b = loop.run_training(_loop_cfg(tmp_path, "k3", steps_per_call=3),
                          arrays=arrays)
    np.testing.assert_allclose(np.asarray(a["global_losses"]),
                               np.asarray(b["global_losses"]),
                               rtol=1e-6)
    for x, y in zip(_params_leaves(a), _params_leaves(b)):
        np.testing.assert_allclose(x, y, rtol=1e-5, atol=1e-7)


@pytest.mark.heavy
def test_orbax_resume_is_exact_mid_epoch(tmp_path):
    """3 iters + auto-resume to 6 == one 6-iter run, bit-for-bit params
    (the resume point lands MID-epoch: 8 sequences / batch 4 = 2
    steps/epoch). Also: the restored curve history is carried forward."""
    from pivp_tpu.training import loop

    arrays = synthetic.generate_sequences(8, 4, 16, 16)

    full = loop.run_training(
        _loop_cfg(tmp_path, "full", checkpointer="orbax"),
        arrays=arrays, run_name="run")

    loop.run_training(
        _loop_cfg(tmp_path, "split", num_iterations=3,
                  checkpointer="orbax"),
        arrays=arrays, run_name="run")
    resumed = loop.run_training(
        _loop_cfg(tmp_path, "split", num_iterations=6,
                  checkpointer="orbax"),
        arrays=arrays, run_name="run")

    assert int(resumed["state"].step) == 6
    for x, y in zip(_params_leaves(full), _params_leaves(resumed)):
        np.testing.assert_array_equal(x, y)

    a = np.asarray(full["global_losses"])
    b = np.asarray(resumed["global_losses"])
    assert a.shape == b.shape == (3, 5)
    # EVERY row matches — including epoch 2, which straddles the resume
    # boundary: its pre-resume step metrics were persisted
    # (training-partial-epoch.npz) and restored, so the flushed row is a
    # full-epoch statistic identical to the uninterrupted run's.
    np.testing.assert_allclose(a, b, rtol=1e-7)


def _request_at_boundary(monkeypatch, n: int):
    """Arrange for the preemption flag to be set at the n-th dispatch
    boundary (as a SIGTERM handler would mid-run) — deterministic, and
    compatible with install() clearing stale flags at run start."""
    from pivp_tpu.training import loop

    calls = {"n": 0}
    real = preemption.requested

    def fake():
        calls["n"] += 1
        if calls["n"] == n:
            preemption.request()
        return real()

    monkeypatch.setattr(loop.preemption, "requested", fake)


@pytest.mark.heavy
def test_graceful_preemption_checkpoint_and_resume(tmp_path, monkeypatch):
    """A preemption request makes the loop checkpoint at the next
    dispatch boundary and exit cleanly; the relaunch auto-resumes and
    lands exactly where an uninterrupted run would."""
    from pivp_tpu.training import loop

    arrays = synthetic.generate_sequences(8, 4, 16, 16)

    full = loop.run_training(
        _loop_cfg(tmp_path, "full", checkpointer="orbax"),
        arrays=arrays, run_name="run")

    before = signal.getsignal(signal.SIGTERM)
    _request_at_boundary(monkeypatch, 1)
    try:
        out = loop.run_training(
            _loop_cfg(tmp_path, "pre", checkpointer="orbax"),
            arrays=arrays, run_name="run")
    finally:
        monkeypatch.undo()
        preemption.clear()
    assert out["preempted"] is True
    assert int(out["state"].step) == 1
    # Handlers restored, preempt-tagged npz artifact written.
    assert signal.getsignal(signal.SIGTERM) is before
    assert os.path.exists(os.path.join(out["save_dir"],
                                       "training-preempt-itr1.npz"))
    # The interrupted epoch's step metrics were persisted for resume.
    assert os.path.exists(os.path.join(out["save_dir"],
                                       "training-partial-epoch.npz"))

    resumed = loop.run_training(
        _loop_cfg(tmp_path, "pre", checkpointer="orbax"),
        arrays=arrays, run_name="run")
    assert resumed["preempted"] is False
    assert int(resumed["state"].step) == 6
    for x, y in zip(_params_leaves(full), _params_leaves(resumed)):
        np.testing.assert_array_equal(x, y)
    # With the partial-epoch stream restored, EVERY curve row — including
    # the epoch straddling the preemption — matches the uninterrupted
    # run (pre-round-4, the straddling row covered only post-resume
    # steps).
    np.testing.assert_allclose(np.asarray(full["global_losses"]),
                               np.asarray(resumed["global_losses"]),
                               rtol=1e-7)


def test_stale_preemption_flag_cleared_at_install(tmp_path):
    """A flag left set by a PREVIOUS preempted run in this process must
    not stop the next run after a single dispatch: install() clears it
    (regression for the round-3 advisor finding)."""
    from pivp_tpu.training import loop

    arrays = synthetic.generate_sequences(4, 4, 16, 16)
    preemption.request()          # stale flag from an earlier run
    try:
        out = loop.run_training(
            _loop_cfg(tmp_path, "stale", num_iterations=2),
            arrays=arrays, run_name="run")
    finally:
        preemption.clear()
    assert out["preempted"] is False
    assert int(out["state"].step) == 2


def test_preemption_handler_sets_flag_and_restores():
    preemption.clear()
    restore = preemption.install()
    try:
        os.kill(os.getpid(), signal.SIGTERM)
        # Python delivers the signal at the next bytecode boundary.
        for _ in range(1000):
            if preemption.requested():
                break
        assert preemption.requested()
    finally:
        restore()
        preemption.clear()


def test_orbax_elastic_restore_across_device_counts(tmp_path):
    """Elastic resume: an orbax checkpoint written on an 8-device mesh
    restores on 1 device (params BIT-equal to what the 8-device run
    saved) and a 4-device continuation trains on from it — the restore
    path is device-count agnostic by construction (host-side numpy
    template, values replicated; training/loop.py)."""
    from pivp_tpu.training import loop

    arrays = synthetic.generate_sequences(8, 4, 16, 16)
    kw = dict(checkpointer="orbax", batch_size=8, schedsamp_k=-1.0)
    first = loop.run_training(
        _loop_cfg(tmp_path, "el", num_iterations=2, num_devices=8, **kw),
        arrays=arrays, run_name="run")
    assert int(first["state"].step) == 2

    # Same-step "resume" on ONE device: zero further dispatches, so the
    # returned state IS the restored checkpoint — bit-equal to what the
    # 8-device run saved.
    restored = loop.run_training(
        _loop_cfg(tmp_path, "el", num_iterations=2, num_devices=1, **kw),
        arrays=arrays, run_name="run")
    assert int(restored["state"].step) == 2
    for x, y in zip(_params_leaves(first), _params_leaves(restored)):
        np.testing.assert_array_equal(x, y)

    # Continuation on a 4-device mesh: resumes at step 2, trains to 4.
    cont = loop.run_training(
        _loop_cfg(tmp_path, "el", num_iterations=4, num_devices=4, **kw),
        arrays=arrays, run_name="run")
    assert int(cont["state"].step) == 4
    assert np.isfinite(np.asarray(cont["global_losses"])).all()
