"""Measure the single-process CPU training-step throughput used as
bench.py's baseline denominator.

The reference trains single-device Chainer (CPU by default,
/root/reference/src/models/train_model.py:888-894). We can't run Python-2
Chainer here, so the stand-in baseline is the SAME model compiled by XLA
on one CPU — which executes strictly faster than Chainer's per-op
define-by-run CPU interpreter, making bench.py's reported speedup a
conservative lower bound.

Run: JAX_PLATFORMS=cpu python tools/measure_cpu_baseline.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ["JAX_PLATFORMS"] = "cpu"

import time  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

# The axon TPU plugin ignores JAX_PLATFORMS from the environment; force it.
jax.config.update("jax_platforms", "cpu")
assert jax.devices()[0].platform == "cpu", jax.devices()

from pivp_tpu.config import ModelConfig  # noqa: E402
from pivp_tpu.data import dataset as dataset_lib  # noqa: E402
from pivp_tpu.data import synthetic  # noqa: E402
from pivp_tpu.parallel import train_step as ts_lib  # noqa: E402

# Batch 4 keeps the one-time measurement tractable on small hosts;
# predicted-frames/s is batch-normalized and CPU throughput is roughly
# batch-linear above this size, so the number transfers to the batch-32
# benchmark config (and smaller batches are, if anything, kinder to the
# CPU cache — i.e. this overstates the CPU baseline slightly, which makes
# bench.py's reported speedup conservative).
BATCH, SEQ, CONTEXT, STEPS = 4, 10, 2, 2


def main():
    cfg = ModelConfig(model_type="CDNA", num_masks=10,
                      sequence_length=SEQ, context_frames=CONTEXT)
    opt = ts_lib.make_optimizer(1e-3)
    state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = ts_lib.make_train_step(cfg, opt, mesh=None)

    imgs, acts, stas = synthetic.generate_sequences(BATCH, SEQ)
    batch = dataset_lib.to_time_major(imgs, acts, stas)
    batch = jax.tree_util.tree_map(jnp.asarray, batch)

    state, m = step(state, batch, jnp.float32(0.0), jax.random.PRNGKey(1))
    jax.block_until_ready(m["loss"])

    t0 = time.perf_counter()
    for i in range(STEPS):
        state, m = step(state, batch, jnp.float32(i + 1),
                        jax.random.PRNGKey(1))
    jax.block_until_ready(m["loss"])
    dt = time.perf_counter() - t0

    sps = STEPS / dt
    fps = sps * BATCH * (SEQ - CONTEXT)
    print(f"CPU: {sps:.4f} steps/s = {fps:.2f} predicted frames/s")


if __name__ == "__main__":
    main()
