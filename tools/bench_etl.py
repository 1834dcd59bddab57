"""ETL-stage throughput: tfrecord -> npy/PNG conversion on full-size
synthetic fixtures (512x640 JPEG frames — the real robot-push shard
geometry, /root/reference/src/data/make_dataset.py:60-61).

Measures `pivp_tpu.data.make_dataset_cli.convert` (the `make data`
stage) end to end: TFRecord parse + JPEG decode + center-crop + LANCZOS
resize + npy/PNG writes, on this host. Three variants isolate the cost
structure:
  * full        — reference artifact contract (64x64 npys + PNG bitmaps
                  + full-res pred npys + pred PNGs);
  * no_png      — npys only (PNG encoding is the artifact tax);
  * decode_only — parse + decode + resize, no writes (the compute
                  floor).

Prints one JSON line per variant with shards/s, sequences/s, frames/s.

Run: python tools/bench_etl.py [--shards 8] [--seq_len 10] [--workers 8]
"""

from __future__ import annotations

import argparse
import io
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from pivp_tpu.data import make_dataset_cli as etl  # noqa: E402
from pivp_tpu.data import tfrecord  # noqa: E402


def make_shard(path: str, seq_len: int, h: int, w: int,
               seed: int) -> None:
    from PIL import Image

    rng = np.random.default_rng(seed)
    feats = {}
    for i in range(seq_len):
        # Structured frames (gradient + noise) so JPEG sizes are
        # realistic (~40-60 KB at 512x640 q75, like the real dataset)
        # rather than noise-inflated or flat-color trivial.
        yy, xx = np.mgrid[0:h, 0:w]
        base = (xx * 255 // w + yy * 127 // h + i * 9) % 256
        img = np.stack([base, base[::-1], base.T[:w].T], axis=-1)
        img = np.clip(img + rng.integers(0, 32, img.shape), 0,
                      255).astype(np.uint8)
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG")
        feats[f"move/{i}/image/encoded"] = [buf.getvalue()]
        feats[f"move/{i}/commanded_pose/vec_pitch_yaw"] = \
            [float(x) for x in rng.normal(size=5)]
        feats[f"move/{i}/endeffector/vec_pitch_yaw"] = \
            [float(x) for x in rng.normal(size=5)]
    tfrecord.write_records(path, [tfrecord.encode_example(feats)])


def bench(tag: str, data_dir: str, n_shards: int, seq_len: int,
          workers: int, **convert_kw) -> None:
    out = tempfile.mkdtemp(prefix=f"etlbench-{tag}-")
    try:
        t0 = time.perf_counter()
        n = etl.convert(data_dir, out, sequence_length=seq_len,
                        num_workers=workers, **convert_kw)
        dt = time.perf_counter() - t0
    finally:
        shutil.rmtree(out, ignore_errors=True)
    assert n == n_shards, (n, n_shards)
    print(json.dumps({
        "metric": f"ETL {tag}", "shards": n_shards,
        "seconds": round(dt, 2),
        "shards_per_sec": round(n_shards / dt, 3),
        "sequences_per_sec": round(n / dt, 3),
        "frames_per_sec": round(n * seq_len / dt, 1),
        "workers": workers,
    }), flush=True)


def bench_decode_only(data_dir: str, n_shards: int, seq_len: int) -> None:
    files = sorted(os.path.join(data_dir, f) for f in os.listdir(data_dir))
    t0 = time.perf_counter()
    frames = 0
    for path in files:
        for example in tfrecord.iter_examples(path):
            jpegs, actions, states = etl.decode_sequence(
                example, seq_len, 5, (512, 640, 3))
            small, full = etl.process_frames(jpegs, (64, 64),
                                             (512, 640, 3))
            frames += small.shape[0]
            break
    dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "ETL decode_only", "shards": n_shards,
        "seconds": round(dt, 2),
        "shards_per_sec": round(n_shards / dt, 3),
        "frames_per_sec": round(frames / dt, 1),
        "workers": 1,
    }), flush=True)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=8)
    ap.add_argument("--seq_len", type=int, default=10)
    ap.add_argument("--workers", type=int, default=8)
    a = ap.parse_args()

    data_dir = tempfile.mkdtemp(prefix="etlbench-raw-")
    try:
        for s in range(a.shards):
            make_shard(os.path.join(
                data_dir, f"push_train_{s:05d}.tfrecord"),
                a.seq_len, 512, 640, seed=s)
        sizes = [os.path.getsize(os.path.join(data_dir, f))
                 for f in os.listdir(data_dir)]
        print(json.dumps({"metric": "ETL fixture",
                          "shards": a.shards,
                          "mean_shard_kb": round(
                              float(np.mean(sizes)) / 1024, 1)}),
              flush=True)
        bench("full", data_dir, a.shards, a.seq_len, a.workers,
              create_img=True, create_img_prediction=True)
        bench("no_png", data_dir, a.shards, a.seq_len, a.workers,
              create_img=False, create_img_prediction=False)
        bench_decode_only(data_dir, a.shards, a.seq_len)
    finally:
        shutil.rmtree(data_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
