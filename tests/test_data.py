"""Tests for the synthetic generator, map.csv dataset contract, and the
epoch batcher."""

import os

import numpy as np
import pytest

from pivp_tpu.data import dataset, synthetic


def test_synthetic_shapes_and_range():
    imgs, acts, stas = synthetic.generate_sequences(3, 6, 32, 32)
    assert imgs.shape == (3, 6, 32, 32, 3)
    assert acts.shape == (3, 6, 5)
    assert stas.shape == (3, 6, 5)
    assert imgs.min() >= 0.0 and imgs.max() <= 1.0
    # Frames must actually move.
    assert np.abs(imgs[0, 0] - imgs[0, -1]).sum() > 0


def test_processed_dir_roundtrip(tmp_path):
    """write_processed_dir emits the exact map.csv/npy contract of the
    reference ETL (make_dataset.py:122-158), load_sequences reads it."""
    out = str(tmp_path / "processed")
    synthetic.write_processed_dir(out, num_sequences=4, sequence_length=5,
                                  height=16, width=16)
    imgs, acts, stas = dataset.load_sequences(out)
    assert imgs.shape == (4, 5, 16, 16, 3)
    assert acts.shape == (4, 5, 5)
    assert stas.shape == (4, 5, 5)
    rows = dataset.load_map_csv(out)
    assert rows[0][:5] == ["id", "img_bitmap_path", "img_np_path",
                           "action_np_path", "state_np_path"]


def test_train_val_split():
    arrays = (np.arange(20).reshape(20, 1), np.arange(20).reshape(20, 1),
              np.arange(20).reshape(20, 1))
    train, val = dataset.train_val_split(arrays, 0.95)
    assert train[0].shape[0] == 19
    assert val[0].shape[0] == 1


def test_epoch_batcher_without_replacement():
    n = 10
    arrays = (np.arange(n).reshape(n, 1, 1, 1, 1).astype(np.float32)
              * np.ones((n, 2, 1, 1, 1), np.float32),
              np.zeros((n, 2, 5), np.float32),
              np.zeros((n, 2, 5), np.float32))
    b = dataset.EpochBatcher(arrays, batch_size=5, seed=1)
    first = b.next()
    second = b.next()
    assert b.is_new_epoch
    ids = np.concatenate([first[0][0, :, 0, 0, 0],
                          second[0][0, :, 0, 0, 0]])
    # One full epoch = every sequence exactly once.
    assert sorted(ids.tolist()) == list(range(n))


def test_epoch_batcher_batch_larger_than_dataset():
    """batch_size > dataset size wraps into the next permutation with
    every sequence used before repeats."""
    n = 3
    arrays = (np.arange(n, dtype=np.float32).reshape(n, 1, 1, 1, 1)
              * np.ones((n, 2, 1, 1, 1), np.float32),
              np.zeros((n, 2, 5), np.float32),
              np.zeros((n, 2, 5), np.float32))
    b = dataset.EpochBatcher(arrays, batch_size=7, seed=0)
    batch = b.next()
    assert batch[0].shape == (2, 7, 1, 1, 1)
    from collections import Counter

    counts = Counter(batch[0][0, :, 0, 0, 0].tolist())
    # 7 draws from 3 sequences = two full epochs + 1: every sequence
    # appears at least twice, none more than three times.
    assert set(counts) == {0.0, 1.0, 2.0}
    assert all(2 <= v <= 3 for v in counts.values())
    assert b.epoch >= 2


def test_epoch_batcher_time_major():
    imgs, acts, stas = synthetic.generate_sequences(6, 4, 16, 16)
    b = dataset.EpochBatcher((imgs, acts, stas), batch_size=2)
    bi, ba, bs = b.next()
    assert bi.shape == (4, 2, 16, 16, 3)
    assert ba.shape == (4, 2, 5)
    assert bs.shape == (4, 2, 5)


def test_eval_batches_pads_final():
    imgs, acts, stas = synthetic.generate_sequences(5, 3, 16, 16)
    batches = list(dataset.eval_batches((imgs, acts, stas), batch_size=2))
    assert len(batches) == 3
    assert all(b[0].shape[1] == 2 for (b, _) in batches)
    assert [n for (_, n) in batches] == [2, 2, 1]
    # The padded row duplicates the last real sequence.
    last_imgs, n = batches[-1]
    assert n == 1
    assert (last_imgs[0][:, 0] == last_imgs[0][:, 1]).all()


def test_lazy_sequences_match_eager(tmp_path):
    """LazySequences must be observationally identical to the in-RAM
    arrays through every pipeline operation: split, batcher gather,
    eval padding."""
    from pivp_tpu.data import synthetic

    d = str(tmp_path / "proc")
    synthetic.write_processed_dir(d, 7, 4, 16, 16, seed=3)
    eager = dataset.load_sequences(d)
    lazy = dataset.lazy_sequences(d)

    assert lazy[0].shape == eager[0].shape
    assert lazy[1].shape == eager[1].shape

    et, ev = dataset.train_val_split(eager, 0.7)
    lt, lv = dataset.train_val_split(lazy, 0.7)
    assert lt[0].shape[0] == et[0].shape[0]
    assert lv[0].shape[0] == ev[0].shape[0]

    be = dataset.EpochBatcher(et, 3, seed=1)
    bl = dataset.EpochBatcher(lt, 3, seed=1)
    for _ in range(5):
        for a, b in zip(be.next(), bl.next()):
            np.testing.assert_array_equal(a, b)
    assert be.epoch == bl.epoch

    for (ba, na), (bb, nb) in zip(dataset.eval_batches(ev, 2),
                                  dataset.eval_batches(lv, 2)):
        assert na == nb
        for a, b in zip(ba, bb):
            np.testing.assert_array_equal(a, b)


@pytest.mark.heavy
def test_lazy_load_trains(tmp_path):
    """End-to-end: --lazy_load training equals the in-memory path."""
    from pivp_tpu.config import TrainConfig
    from pivp_tpu.data import synthetic
    from pivp_tpu.training import loop

    d = str(tmp_path / "proc")
    synthetic.write_processed_dir(d, 8, 4, 16, 16, seed=2)

    def run(lazy, tag):
        cfg = TrainConfig(
            data_dir=d, num_iterations=4, batch_size=4,
            sequence_length=4, context_frames=2, num_masks=3,
            train_val_split=0.75, validation_interval=1,
            save_interval=100, output_dir=str(tmp_path / tag),
            image_height=16, image_width=16, lazy_load=lazy)
        return np.asarray(loop.run_training(cfg)["global_losses"])

    np.testing.assert_array_equal(run(False, "eager"), run(True, "lazy"))


def test_dotenv_loader(tmp_path, monkeypatch):
    """Dependency-free .env support (the reference's make_dataset.py:173
    contract): nearest file found walking up, KEY=VALUE parsed, existing
    environment wins."""
    from pivp_tpu.utils import dotenv

    sub = tmp_path / "a" / "b"
    sub.mkdir(parents=True)
    (tmp_path / ".env").write_text(
        "# comment\nexport FOO=bar\nQUOTED='x y'\nEXISTING=new\n\n")
    monkeypatch.chdir(sub)
    monkeypatch.setenv("EXISTING", "old")
    monkeypatch.delenv("FOO", raising=False)
    monkeypatch.delenv("QUOTED", raising=False)

    path = dotenv.find_dotenv()
    assert path == str(tmp_path / ".env")
    assert dotenv.load_dotenv(path) is True
    assert os.environ["FOO"] == "bar"
    assert os.environ["QUOTED"] == "x y"
    assert os.environ["EXISTING"] == "old"     # not overridden
    monkeypatch.delenv("FOO")
    monkeypatch.delenv("QUOTED")
