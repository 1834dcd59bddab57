"""Native fused batch assembler (native/batch_assembler.cc) vs the numpy
path: bit-identical payloads, same epoch bookkeeping, loop integration.

The assembler replaces the input pipeline's per-dispatch numpy chain
(gather -> time-major transpose -> K-stack -> u8 quantize) with one
native pass; these tests pin the contract that both produce the exact
same bytes (collation contract of the reference's concat_examples,
train_model.py:51-71)."""

import numpy as np
import pytest

from pivp_tpu.data import assembler, dataset, native


def _rand_arrays(n=7, t=5, h=6, w=4, c=3, seed=0):
    rng = np.random.RandomState(seed)
    images = rng.rand(n, t, h, w, c).astype(np.float32)
    actions = rng.rand(n, t, 5).astype(np.float32)
    states = rng.rand(n, t, 5).astype(np.float32)
    return images, actions, states


def _legacy_payload(arrays, idx, quantize):
    """The pre-assembler loop path: per-batch time-major gather, np.stack
    over K, then quantize."""
    images, actions, states = arrays
    batches = [dataset.to_time_major(images[i], actions[i], states[i])
               for i in idx]
    stacked = tuple(np.stack([b[j] for b in batches]) for j in range(3))
    if quantize:
        stacked = (np.clip(stacked[0] * 255.0 + 0.5, 0.0,
                           255.0).astype(np.uint8),) + stacked[1:]
    return stacked


def test_native_lib_available():
    # The build env has g++; if this fails the fallback still works but
    # the native component is part of the framework deliverable.
    assert native.get_assembler_lib() is not None


@pytest.mark.parametrize("quantize", [False, True])
def test_native_matches_numpy_fallback(quantize):
    if native.get_assembler_lib() is None:
        pytest.skip("no native toolchain")
    images, _, _ = _rand_arrays()
    # include values outside [0,1] to exercise the clip
    images[0, 0, 0, 0, 0] = -0.5
    images[1, 1, 1, 1, 1] = 1.5
    idx = np.array([[0, 3, 3], [6, 1, 2], [5, 5, 0], [2, 4, 1]], np.int64)
    got = assembler._native_images(images, idx, quantize)
    want = assembler._time_major_gather(images, idx)
    if quantize:
        want = assembler._quantize_u8(want)
    assert got.dtype == want.dtype and got.shape == want.shape
    np.testing.assert_array_equal(got, want)


@pytest.mark.parametrize("quantize", [False, True])
def test_assemble_calls_matches_legacy_path(quantize):
    arrays = _rand_arrays()
    idx = np.array([[1, 0, 4, 2], [3, 3, 6, 5], [0, 2, 1, 4]], np.int64)
    got = assembler.assemble_calls(arrays, idx, quantize)
    want = _legacy_payload(arrays, idx, quantize)
    for g, w in zip(got, want):
        assert g.dtype == w.dtype and g.shape == w.shape
        np.testing.assert_array_equal(g, w)


@pytest.mark.parametrize("quantize", [False, True])
def test_assemble_calls_fallback_identical(monkeypatch, quantize):
    """Force the numpy fallback and check it produces the same bytes as
    the native path — the guarantee that a toolchain-less host trains
    identically."""
    if native.get_assembler_lib() is None:
        pytest.skip("no native toolchain")
    arrays = _rand_arrays(seed=3)
    idx = np.array([[0, 6], [5, 1]], np.int64)
    with_native = assembler.assemble_calls(arrays, idx, quantize)
    monkeypatch.setattr(assembler, "_native_ok", lambda images: False)
    without = assembler.assemble_calls(arrays, idx, quantize)
    for g, w in zip(with_native, without):
        np.testing.assert_array_equal(g, w)


def test_assemble_calls_lazy_store(tmp_path):
    """LazySequences (mmap/out-of-core) stores go through the gather
    fallback — same payload as the materialized array."""
    images, actions, states = _rand_arrays(n=5)
    paths = []
    for i in range(5):
        p = tmp_path / f"seq_{i}.npy"
        np.save(p, images[i])
        paths.append(str(p))
    lazy = dataset.LazySequences(paths)
    idx = np.array([[4, 0], [2, 2], [1, 3]], np.int64)
    got = assembler.assemble_calls((lazy, actions, states), idx, False)
    want = assembler.assemble_calls((images, actions, states), idx, False)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


def test_next_indices_matches_next():
    """next() == gather(next_indices()) across epoch boundaries, with
    identical epoch/is_new_epoch bookkeeping."""
    arrays = _rand_arrays(n=7)
    b1 = dataset.EpochBatcher(arrays, batch_size=3, seed=11)
    b2 = dataset.EpochBatcher(arrays, batch_size=3, seed=11)
    for _ in range(10):   # 7 rows / batch 3 -> wraps several epochs
        batch = b1.next()
        idx = b2.next_indices()
        assert b1.epoch == b2.epoch
        assert b1.is_new_epoch == b2.is_new_epoch
        want = dataset.to_time_major(arrays[0][idx], arrays[1][idx],
                                     arrays[2][idx])
        for g, w in zip(batch, want):
            np.testing.assert_array_equal(g, w)
