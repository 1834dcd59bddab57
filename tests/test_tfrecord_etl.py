"""Tests for the pure-Python TFRecord parser and the raw->processed ETL."""

import io
import os

import numpy as np
import pytest

from pivp_tpu.data import make_dataset_cli, tfrecord


def make_jpeg(h, w, seed=0):
    from PIL import Image

    rng = np.random.RandomState(seed)
    arr = rng.randint(0, 255, (h, w, 3), np.uint8)
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="JPEG")
    return buf.getvalue()


def robot_push_example(seq_len=4, h=32, w=40, seed=0):
    feats = {}
    for i in range(seq_len):
        feats[f"move/{i}/image/encoded"] = [make_jpeg(h, w, seed * 100 + i)]
        feats[f"move/{i}/commanded_pose/vec_pitch_yaw"] = \
            [float(x) for x in np.arange(5) + i + seed]
        feats[f"move/{i}/endeffector/vec_pitch_yaw"] = \
            [float(x) for x in -(np.arange(5) + i + seed)]
    return feats


def test_example_roundtrip():
    feats = {"a/bytes": [b"hello", b"world"],
             "b/floats": [1.5, -2.25, 3.0],
             "c/ints": [7, 1000000, 0]}
    rec = tfrecord.encode_example(feats)
    parsed = tfrecord.parse_example(rec)
    assert parsed["a/bytes"] == [b"hello", b"world"]
    np.testing.assert_allclose(parsed["b/floats"], [1.5, -2.25, 3.0])
    assert parsed["c/ints"] == [7, 1000000, 0]


def test_tfrecord_file_roundtrip(tmp_path):
    path = str(tmp_path / "test.tfrecord")
    recs = [tfrecord.encode_example({"x": [float(i)]}) for i in range(5)]
    tfrecord.write_records(path, recs)
    examples = list(tfrecord.iter_examples(path))
    assert len(examples) == 5
    assert examples[3]["x"] == [3.0]


def test_crc_detects_corruption(tmp_path):
    path = str(tmp_path / "bad.tfrecord")
    tfrecord.write_records(path, [b"payload-bytes"])
    data = bytearray(open(path, "rb").read())
    data[14] ^= 0xFF  # flip a payload byte
    open(path, "wb").write(bytes(data))
    with pytest.raises(IOError):
        list(tfrecord.read_records(path))


def test_parser_matches_tensorflow_writer(tmp_path):
    """Cross-check against TF's own Example encoder when available."""
    tf = pytest.importorskip("tensorflow")
    path = str(tmp_path / "tf.tfrecord")
    ex = tf.train.Example(features=tf.train.Features(feature={
        "img": tf.train.Feature(
            bytes_list=tf.train.BytesList(value=[b"\x01\x02"])),
        "vec": tf.train.Feature(
            float_list=tf.train.FloatList(value=[0.5, 1.5])),
    }))
    with tf.io.TFRecordWriter(path) as w:
        w.write(ex.SerializeToString())
    parsed = list(tfrecord.iter_examples(path))[0]
    assert parsed["img"] == [b"\x01\x02"]
    np.testing.assert_allclose(parsed["vec"], [0.5, 1.5])


def test_convert_end_to_end(tmp_path):
    """Full ETL: tfrecord shards -> npy + PNG + map.csv, loadable by the
    dataset loader."""
    raw = tmp_path / "raw"
    raw.mkdir()
    for shard in range(2):
        recs = [tfrecord.encode_example(
            robot_push_example(4, 32, 40, seed=shard * 10 + r))
                for r in range(3)]
        tfrecord.write_records(str(raw / f"push.tfrecord-{shard}"), recs)

    out = str(tmp_path / "processed")
    n = make_dataset_cli.convert(
        str(raw), out, sequence_length=4, image_original_width=40,
        image_original_height=32, image_resize_width=8,
        image_resize_height=8, sequences_per_file=1, num_workers=2)
    assert n == 2  # reference behavior: one record per shard

    from pivp_tpu.data import dataset

    imgs, acts, stas = dataset.load_sequences(out)
    assert imgs.shape == (2, 4, 8, 8, 3)
    assert imgs.min() >= 0 and imgs.max() <= 1.0
    assert acts.shape == (2, 4, 5)
    np.testing.assert_allclose(acts[0, 1], np.arange(5) + 1)
    assert os.path.exists(os.path.join(out, "image_batch_0_0.png"))
    assert os.path.exists(os.path.join(out, "image_batch_pred_0.npy"))
    full = np.load(os.path.join(out, "image_batch_pred_0.npy"))
    assert full.shape == (4, 32, 40, 3)

    # sequences_per_file=0 ingests everything.
    out2 = str(tmp_path / "processed_all")
    n2 = make_dataset_cli.convert(
        str(raw), out2, sequence_length=4, image_original_width=40,
        image_original_height=32, image_resize_width=8,
        image_resize_height=8, sequences_per_file=0, num_workers=2)
    assert n2 == 6


def test_shard_listing():
    from pivp_tpu.data import download

    listing = download.shard_listing()
    assert len(listing) == 274
    assert listing[0].startswith("push/push_train/push_train.tfrecord-")
    assert sum("testnovel" in p for p in listing) == 5
    assert sum("testseen" in p for p in listing) == 5
