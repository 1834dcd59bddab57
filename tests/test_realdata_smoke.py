"""Network-gated real-data end-to-end smoke: the day this environment
has network, the full reference chain — download one real robot-push
shard -> ETL -> one train step -> one predict render — is proven with
zero new work. Auto-skips (never fails) when the GCS bucket is
unreachable.

Chain under test mirrors /root/reference/data/raw/download_data.sh:42-50
(curl from brain-robotics-data) + src/data/make_dataset.py:100-158
(tfrecord -> npy/PNG/map.csv) + the train/predict entry points.
"""

import os
import socket
import urllib.request

import numpy as np
import pytest

pytestmark = pytest.mark.heavy

from pivp_tpu.data import download as download_lib

_CACHE = os.environ.get("PIVP_REALDATA_CACHE",
                        os.path.join(os.path.expanduser("~"), ".cache",
                                     "pivp_tpu", "realdata"))


def _network_available() -> bool:
    try:
        socket.getaddrinfo("storage.googleapis.com", 443)
    except OSError:
        return False
    try:
        req = urllib.request.Request(download_lib.BUCKET, method="HEAD")
        urllib.request.urlopen(req, timeout=10)
    except Exception as exc:  # noqa: BLE001
        # DNS resolves but the bucket is unreachable (proxy/egress
        # filtering) — still a skip, not a failure.
        code = getattr(exc, "code", None)
        if code is None or code >= 500:
            return False
    return True


@pytest.mark.skipif(not _network_available(),
                    reason="storage.googleapis.com unreachable "
                           "(no network egress in this environment)")
def test_realdata_download_etl_train_predict(tmp_path):
    from pivp_tpu.config import TrainConfig
    from pivp_tpu.data import make_dataset_cli as etl
    from pivp_tpu.data import dataset as dataset_lib
    from pivp_tpu.inference import predict as predict_lib
    from pivp_tpu.training import loop

    # 1. Download ONE real shard (cached across runs).
    rel = download_lib.shard_listing(["push_testseen"])[0]
    shard = download_lib.download_file(rel, _CACHE, skip_existing=True)
    assert os.path.getsize(shard) > 1 << 20, "shard suspiciously small"

    # 2. ETL it through the real converter (full artifact contract).
    raw_dir = tmp_path / "raw"
    raw_dir.mkdir()
    os.symlink(shard, raw_dir / os.path.basename(shard))
    out_dir = str(tmp_path / "processed")
    n = etl.convert(str(raw_dir), out_dir, sequences_per_file=4,
                    num_workers=4)
    assert n == 4
    assert os.path.exists(os.path.join(out_dir, "map.csv"))

    # 3. Load via the map.csv contract and train a couple of steps.
    arrays = dataset_lib.load_sequences(out_dir)
    assert arrays[0].shape[1:] == (10, 64, 64, 3)
    cfg = TrainConfig(num_iterations=2, batch_size=2, sequence_length=10,
                      context_frames=2, num_masks=3,
                      train_val_split=0.75, validation_interval=100,
                      save_interval=1, output_dir=str(tmp_path / "models"))
    result = loop.run_training(cfg, arrays=arrays)
    assert np.isfinite(result["global_losses"]).all()

    # 4. Predict a render from the trained checkpoint over the real data.
    out = predict_lib.predict_and_render(
        model_dir=result["run_name"], model_name="training-final.npz",
        data_index=0, models_dir=str(tmp_path / "models"),
        data_dir=out_dir, time_step=8, num_masks=3, gif=False)
    assert os.path.exists(out)
