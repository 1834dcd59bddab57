"""Scheduled sampling, trace-friendly.

The reference implements scheduled sampling by shuffling indices on the
host, slicing rows out of CPU numpy arrays, and stitching them back
(/root/reference/src/models/train_model.py:73-122) — a per-element Python
loop that both leaves the device and detaches gradients for the sampled
rows. Here the same distribution (exactly `num_ground_truth` uniformly
random rows take ground truth) is realized on-device with a random ranking
and a `jnp.where`, fully inside jit/scan and differentiable through the
generated branch.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def num_ground_truth(batch_size: int, k: float,
                     iter_num: jnp.ndarray) -> jnp.ndarray:
    """Inverse-sigmoid decay: round(B * k / (k + exp(iter/k))).

    Reference: train_model.py:652-657.
    """
    frac = k / (k + jnp.exp(iter_num.astype(jnp.float32) / k))
    return jnp.round(batch_size * frac).astype(jnp.int32)


def scheduled_sample(key: jax.Array, ground_truth: jnp.ndarray,
                     generated: jnp.ndarray, n_ground_truth: jnp.ndarray,
                     detach_sampled: bool = False) -> jnp.ndarray:
    """Mix exactly `n_ground_truth` random rows of ground truth with
    generated rows for the rest of the batch.

    ground_truth / generated: (B, ...). n_ground_truth: traced int32 scalar.
    `detach_sampled=True` reproduces the reference's CPU round-trip side
    effect of blocking gradients through the mixed result.
    """
    batch = ground_truth.shape[0]
    # Random ranking: row b takes ground truth iff its rank < n_ground_truth.
    u = jax.random.uniform(key, (batch,))
    rank = jnp.argsort(jnp.argsort(u))
    is_gt = rank < n_ground_truth
    shape = (batch,) + (1,) * (ground_truth.ndim - 1)
    mixed = jnp.where(is_gt.reshape(shape), ground_truth, generated)
    if detach_sampled:
        mixed = jax.lax.stop_gradient(mixed)
    return mixed
