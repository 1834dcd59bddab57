"""Host-side K-dispatch batch-assembly benchmark: the legacy numpy chain
(gather -> time-major -> np.stack -> quantize) vs the fused native
assembler (native/batch_assembler.cc). This is the producer-thread work
that caused the periodic epoch refill stalls documented in BENCHMARKS.md
"Input pipeline".

Run: python tools/bench_input_assembly.py [--k 25] [--batch 32]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from pivp_tpu.data import assembler, dataset, native  # noqa: E402

SEQ = 10


def legacy(arrays, idx, quantize):
    images, actions, states = arrays
    batches = [dataset.to_time_major(images[i], actions[i], states[i])
               for i in idx]
    stacked = tuple(np.stack([b[j] for b in batches]) for j in range(3))
    if quantize:
        stacked = (np.clip(stacked[0] * 255.0 + 0.5, 0.0,
                           255.0).astype(np.uint8),) + stacked[1:]
    return stacked


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=25)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--n", type=int, default=843)
    ap.add_argument("--rounds", type=int, default=5)
    a = ap.parse_args()

    rng = np.random.RandomState(0)
    arrays = (rng.rand(a.n, SEQ, 64, 64, 3).astype(np.float32),
              rng.rand(a.n, SEQ, 5).astype(np.float32),
              rng.rand(a.n, SEQ, 5).astype(np.float32))
    mb = a.k * a.batch * SEQ * 64 * 64 * 3 * 4 / 1e6
    print(f"payload: K={a.k} B={a.batch} -> {mb:.0f} MB f32 gathered; "
          f"native={'yes' if native.get_assembler_lib() else 'NO'}")

    for quantize in (False, True):
        for name, fn in (("legacy numpy", legacy),
                         ("fused", assembler.assemble_calls)):
            # fresh indices each round so the gather pattern isn't cached
            times = []
            for r in range(a.rounds):
                idx = rng.randint(0, a.n, size=(a.k, a.batch)).astype(
                    np.int64)
                t0 = time.perf_counter()
                out = fn(arrays, idx, quantize)
                times.append(time.perf_counter() - t0)
                del out
            best = min(times)
            print(f"  u8={int(quantize)} {name:13s}: {best*1000:8.1f} ms"
                  f"/dispatch  ({mb/best/1000:.2f} GB/s gathered)")


if __name__ == "__main__":
    main()
