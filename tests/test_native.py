"""Native C++ TFRecord scanner: build, CRC cross-check vs the Python
implementation, index round-trip, corruption detection."""

import numpy as np
import pytest

from pivp_tpu.data import native, tfrecord


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native toolchain unavailable")
    return lib


def test_crc32c_matches_python(lib):
    for seed in range(3):
        data = np.random.RandomState(seed).bytes(257)
        assert native.crc32c(data) == tfrecord._crc32c(data)
    assert native.crc32c(b"") == tfrecord._crc32c(b"")


def test_index_roundtrip(tmp_path, lib):
    path = str(tmp_path / "t.tfrecord")
    recs = [tfrecord.encode_example({"x": [float(i)], "tag": [b"r"]})
            for i in range(9)]
    tfrecord.write_records(path, recs)
    idx = native.index_records(path)
    assert len(idx) == 9
    # Payload slices parse identically to the pure-Python reader.
    with open(path, "rb") as f:
        for i, (off, ln) in enumerate(idx):
            f.seek(off)
            parsed = tfrecord.parse_example(f.read(ln))
            assert parsed["x"] == [float(i)]


def test_native_detects_corruption(tmp_path, lib):
    path = str(tmp_path / "bad.tfrecord")
    tfrecord.write_records(path, [b"some-payload-here"])
    data = bytearray(open(path, "rb").read())
    data[15] ^= 0x5A
    open(path, "wb").write(bytes(data))
    with pytest.raises(IOError):
        native.index_records(path)


def test_missing_file(lib):
    with pytest.raises(IOError):
        native.index_records("/nonexistent/path.tfrecord")
