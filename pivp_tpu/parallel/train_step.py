"""Jitted, mesh-sharded train / eval steps.

The reference's `optimizer.update(model, batch, itr)` + define-by-run
backward (/root/reference/src/models/train_model.py:950 and Chainer
internals) becomes ONE compiled XLA program: forward scan rollout, backward
through the scan, Adam update — with the batch sharded over the mesh's
`data` axis and parameters replicated, so XLA inserts the gradient
all-reduce over ICI automatically.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pivp_tpu.config import ModelConfig
from pivp_tpu.models import predictor
from pivp_tpu.parallel import mesh as mesh_lib


def _use_mesh(mesh: Optional[Mesh]) -> bool:
    """GSPMD sharding annotations only pay off on >1 device; on a single
    chip the partitioned-executable path adds pure overhead (measured
    ~10^4x slower through remote-attached runtimes), so fall back to
    plain jit."""
    return mesh is not None and mesh.size > 1


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def create_train_state(key: jax.Array, cfg: ModelConfig,
                       optimizer: optax.GradientTransformation
                       ) -> TrainState:
    params = predictor.init_params(key, cfg)
    return TrainState(params, optimizer.init(params), jnp.int32(0))


def make_optimizer(learning_rate: float = 1e-3) -> optax.GradientTransformation:
    """Adam with the reference's (Chainer-default) hyperparameters:
    alpha=lr, beta1=0.9, beta2=0.999, eps=1e-8 (train_model.py:860)."""
    return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)


_METRIC_KEYS = ("loss", "psnr_all", "recon_costs", "psnrs", "state_costs",
                "psnr_per_image", "ssim")


def _loss_fn(params, cfg: ModelConfig, batch, iter_num, rng, remat: bool):
    images, actions, states = batch
    out = predictor.rollout(params, cfg, images, actions, states,
                            iter_num, rng, train=True, remat=remat)
    return out["loss"], {k: out[k] for k in _METRIC_KEYS}


def make_train_step(cfg: ModelConfig,
                    optimizer: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None,
                    remat: bool = False,
                    spatial_parallel: bool = False):
    """Build the jitted train step.

    Signature: step(state, (images, actions, states), iter_num, rng)
      -> (new_state, metrics). Batches are time-major (T, B, ...);
    with a mesh, B is sharded over the `data` axis and state is
    replicated (donated for in-place update).

    `spatial_parallel=True` additionally shards the image HEIGHT axis
    over the mesh's `model` axis: GSPMD partitions every conv spatially
    and inserts the halo exchanges over ICI — sequence/spatial
    parallelism for resolutions that don't fit one chip (no reference
    equivalent; the reference is single-device).
    """

    def train_step(state: TrainState, batch, iter_num, rng):
        grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)
        (_, metrics), grads = grad_fn(state.params, cfg, batch,
                                      iter_num, rng, remat)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_opt, state.step + 1)
        return new_state, metrics

    if not _use_mesh(mesh):
        return jax.jit(train_step, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    if spatial_parallel:
        # Guard: GSPMD halo exchange silently truncates when a conv's
        # halo exceeds the neighbor shard (observed: stage-2 activations
        # off by >10 at 16x16/2-way). The deepest spatial extent is H/8
        # (a 5x5 ConvLSTM there has halo 2), so require at least 4 rows
        # per model shard.
        model_shards = mesh.shape[mesh_lib.MODEL_AXIS]
        deepest = cfg.image_height // 8
        if deepest // model_shards < 4:
            raise ValueError(
                f"spatial_parallel needs (image_height//8)/model_shards "
                f">= 4 rows per shard; got {deepest}//{model_shards}. "
                f"Reduce model_parallel or increase image_height.")
        # images (T, B, H, W, C): B over data, H over model.
        img_sh = NamedSharding(mesh, P(None, mesh_lib.DATA_AXIS,
                                       mesh_lib.MODEL_AXIS))
        vec_sh = NamedSharding(mesh, P(None, mesh_lib.DATA_AXIS))
        batch_sh = (img_sh, vec_sh, vec_sh)
    else:
        bsh = mesh_lib.batch_sharding(mesh)
        batch_sh = (bsh, bsh, bsh)
    return jax.jit(
        train_step,
        in_shardings=(repl, batch_sh, repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_train_multi(cfg: ModelConfig,
                     optimizer: optax.GradientTransformation,
                     mesh: Optional[Mesh] = None,
                     remat: bool = False):
    """K optimizer steps per dispatch: scan over a leading batch axis.

    Signature: multi(state, batches, iter0, rng) -> (state, metrics)
    where batches = (images (K,T,B,...), actions (K,T,B,A),
    states (K,T,B,S)) and metrics holds per-step losses/psnrs of shape
    (K,). One host->device round-trip per K steps — this is the
    high-throughput path for remote-attached TPUs and the benchmark
    harness (no reference equivalent; the reference dispatches per
    iteration, train_model.py:937-950).
    """

    def multi_step(state: TrainState, batches, iter0, rng):
        k_total = batches[0].shape[0]
        ks = jnp.arange(k_total)

        def body(state, xs):
            k, batch = xs
            grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)
            (_, metrics), grads = grad_fn(
                state.params, cfg, batch,
                iter0 + k.astype(jnp.float32),
                jax.random.fold_in(rng, k), remat)
            updates, new_opt = optimizer.update(grads, state.opt_state,
                                                state.params)
            new_params = optax.apply_updates(state.params, updates)
            out = {"loss": metrics["loss"],
                   "psnr_all": metrics["psnr_all"]}
            return TrainState(new_params, new_opt, state.step + 1), out

        return jax.lax.scan(body, state, (ks, batches))

    if not _use_mesh(mesh):
        return jax.jit(multi_step, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    bsh = NamedSharding(mesh, P(None, None, mesh_lib.DATA_AXIS))
    return jax.jit(
        multi_step,
        in_shardings=(repl, (bsh, bsh, bsh), repl, repl),
        out_shardings=(repl, repl),
        donate_argnums=(0,),
    )


def make_eval_step(cfg: ModelConfig, mesh: Optional[Mesh] = None):
    """Validation/inference step: train=False (feed-self rollout), returns
    the metrics dict plus generated images/states."""

    def eval_step(params, batch, rng):
        images, actions, states = batch
        out = predictor.rollout(params, cfg, images, actions, states,
                                jnp.float32(0.0), rng, train=False)
        return out

    if not _use_mesh(mesh):
        return jax.jit(eval_step)

    repl = NamedSharding(mesh, P())
    bsh = mesh_lib.batch_sharding(mesh)
    return jax.jit(eval_step,
                   in_shardings=(repl, (bsh, bsh, bsh), repl))
