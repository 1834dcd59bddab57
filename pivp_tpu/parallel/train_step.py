"""Jitted, mesh-sharded train / eval steps.

The reference's `optimizer.update(model, batch, itr)` + define-by-run
backward (/root/reference/src/models/train_model.py:950 and Chainer
internals) becomes ONE compiled XLA program: forward scan rollout, backward
through the scan, Adam update — with the batch sharded over the mesh's
`data` axis and parameters replicated, so XLA inserts the gradient
all-reduce over ICI automatically.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional, Tuple

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


class ChainerAdamState(NamedTuple):
    count: jnp.ndarray
    mu: Any
    nu: Any


def chainer_adam(learning_rate: float, b1: float = 0.9, b2: float = 0.999,
                 eps: float = 1e-8) -> optax.GradientTransformation:
    """Adam with Chainer's exact update rule (the reference optimizer,
    train_model.py:860-861 -> chainer.optimizers.Adam):

        m  <- m + (1-b1) (g - m)
        v  <- v + (1-b2) (g^2 - v)
        p  <- p - alpha_t * m / (sqrt(v) + eps),
              alpha_t = alpha * sqrt(1 - b2^t) / (1 - b1^t)

    This differs from `optax.adam` only in where eps sits: Chainer adds
    eps to sqrt(v) (the *uncorrected* second moment), optax to
    sqrt(v_hat). Equivalent to optax with a time-dependent
    eps/sqrt(1-b2^t) — negligible for healthy gradients, but this form is
    what the reference ran and what the torch training-parity oracle
    checks bit-for-bit (tests/test_reference_parity_train.py)."""

    def init_fn(params):
        zeros = lambda: jax.tree_util.tree_map(jnp.zeros_like, params)
        return ChainerAdamState(jnp.zeros((), jnp.int32), zeros(), zeros())

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        mu = jax.tree_util.tree_map(
            lambda m, g: m + (1.0 - b1) * (g - m), state.mu, updates)
        nu = jax.tree_util.tree_map(
            lambda v, g: v + (1.0 - b2) * (g * g - v), state.nu, updates)
        t = count.astype(jnp.result_type(float))
        alpha_t = learning_rate * jnp.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        new_updates = jax.tree_util.tree_map(
            lambda m, v: (-alpha_t * m / (jnp.sqrt(v) + eps)).astype(
                m.dtype), mu, nu)
        return new_updates, ChainerAdamState(count, mu, nu)

    return optax.GradientTransformation(init_fn, update_fn)


def make_optimizer(learning_rate: float = 1e-3,
                   flavor: str = "chainer") -> optax.GradientTransformation:
    """Adam with the reference's (Chainer-default) hyperparameters:
    alpha=lr, beta1=0.9, beta2=0.999, eps=1e-8 (train_model.py:860).

    flavor 'chainer' (default) is the reference's exact update rule
    (see `chainer_adam`); 'adam' is stock optax Adam (eps inside the
    bias-corrected denominator) — the pre-round-3 behavior."""
    if flavor == "chainer":
        return chainer_adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    if flavor == "adam":
        return optax.adam(learning_rate, b1=0.9, b2=0.999, eps=1e-8)
    raise ValueError(f"unknown optimizer flavor {flavor!r}")


# Metrics carried out of the TRAIN step: the reference's summary set
# (loss / psnr / per-frame curves, train_model.py:744-759). The heavier
# image-quality metrics (windowed SSIM, per-image PSNR) stay in the eval
# step only — selecting keys here lets XLA dead-code-eliminate their
# compute from the training program entirely.
_METRIC_KEYS = ("loss", "psnr_all", "recon_costs", "psnrs", "state_costs")


def _loss_fn(params, cfg: ModelConfig, batch, iter_num, rng, remat: bool):
    images, actions, states = batch
    out = predictor.rollout(params, cfg, images, actions, states,
                            iter_num, rng, train=True, remat=remat)
    return out["loss"], {k: out[k] for k in _METRIC_KEYS}


def _grads_and_metrics(params, cfg: ModelConfig, batch, iter_num, rng,
                       remat: bool, grad_accum: int,
                       grad_accum_unroll: bool = False):
    """Gradients + metrics, optionally accumulated over `grad_accum`
    microbatches (lax.scan over contiguous batch slices; activations for
    only one microbatch live at a time, so peak HBM scales with
    B/grad_accum). The loss is a mean over the batch, so averaging
    microbatch gradients is exact; batch-nonlinear metrics (PSNR of the
    batch-mean MSE) become means of per-microbatch values.

    `grad_accum_unroll=True` unrolls the accumulation scan: the
    microbatch forward+backward branches become INDEPENDENT subgraphs
    (only the cheap gradient adds chain them), letting XLA's
    latency-hiding scheduler interleave one branch's elementwise loop
    fusions with another's MXU convolutions. Identical op order per
    microbatch, so results are bit-equal to the scan — this is purely a
    schedule experiment (peak activation HBM grows back toward the
    unsplit batch since branches overlap).

    No reference equivalent — the reference is capped by what one
    device's memory fits at batch 32 (train_model.py:887-894).
    """
    grad_fn = jax.value_and_grad(_loss_fn, has_aux=True)
    if grad_accum <= 1:
        (_, metrics), grads = grad_fn(params, cfg, batch, iter_num, rng,
                                      remat)
        return grads, metrics

    b = batch[0].shape[1]
    if b % grad_accum:
        raise ValueError(f"batch {b} not divisible by grad_accum "
                         f"{grad_accum}")
    mb = b // grad_accum

    def split_mb(x):  # (T, B, ...) -> (G, T, B/G, ...)
        return x.reshape(x.shape[0], grad_accum, mb,
                         *x.shape[2:]).swapaxes(0, 1)

    micro = tuple(split_mb(a) for a in batch)

    def body(carry, xs):
        g, mb_batch = xs
        (_, metrics), grads = grad_fn(params, cfg, mb_batch, iter_num,
                                      jax.random.fold_in(rng, g), remat)
        g_acc, m_acc = carry
        g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
        m_acc = jax.tree_util.tree_map(jnp.add, m_acc, metrics)
        return (g_acc, m_acc), None

    # Microbatch 0 seeds the accumulator; the scan covers the rest.
    mb0 = tuple(m[0] for m in micro)
    (_, m0), g0 = grad_fn(params, cfg, mb0, iter_num,
                          jax.random.fold_in(rng, 0), remat)
    rest = tuple(m[1:] for m in micro)
    (g_sum, m_sum), _ = jax.lax.scan(
        body, (g0, m0), (jnp.arange(1, grad_accum), rest),
        unroll=grad_accum_unroll)
    inv = 1.0 / grad_accum
    grads = jax.tree_util.tree_map(lambda x: x * inv, g_sum)
    metrics = jax.tree_util.tree_map(lambda x: x * inv, m_sum)
    return grads, metrics


def make_train_step(cfg: ModelConfig,
                    optimizer: optax.GradientTransformation,
                    mesh: Optional[Mesh] = None,
                    remat: bool = False,
                    spatial_parallel: bool = False,
                    grad_accum: int = 1,
                    grad_accum_unroll: bool = False):
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
        grads, metrics = _grads_and_metrics(state.params, cfg, batch,
                                            iter_num, rng, remat,
                                            grad_accum, grad_accum_unroll)
        updates, new_opt = optimizer.update(grads, state.opt_state,
                                            state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(new_params, new_opt, state.step + 1)
        return new_state, metrics

    if not _use_mesh(mesh):
        return jax.jit(train_step, donate_argnums=(0,))

    repl = NamedSharding(mesh, P())
    if spatial_parallel:
        _spatial_guard(cfg, mesh)
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


def _spatial_guard(cfg: ModelConfig, mesh: Mesh) -> None:
    """GSPMD halo exchange silently truncates when a conv's halo exceeds
    the neighbor shard (observed: stage-2 activations off by >10 at
    16x16/2-way). The deepest spatial extent is H/8 (a 5x5 ConvLSTM there
    has halo 2), so require at least 4 rows per model shard."""
    model_shards = mesh.shape[mesh_lib.MODEL_AXIS]
    deepest = cfg.image_height // 8
    if deepest // model_shards < 4:
        raise ValueError(
            f"spatial_parallel needs (image_height//8)/model_shards "
            f">= 4 rows per shard; got {deepest}//{model_shards}. "
            f"Reduce model_parallel or increase image_height.")


def make_train_multi(cfg: ModelConfig,
                     optimizer: optax.GradientTransformation,
                     mesh: Optional[Mesh] = None,
                     remat: bool = False,
                     spatial_parallel: bool = False,
                     grad_accum: int = 1,
                     grad_accum_unroll: bool = False):
    """K optimizer steps per dispatch: scan over a leading batch axis.

    Signature: multi(state, batches, iter0, rng, k_real)
      -> (state, metrics)
    where batches = (images (K,T,B,...), actions (K,T,B,A),
    states (K,T,B,S)) and metrics holds per-step losses/psnrs of shape
    (K,). One host->device round-trip per K steps — this is the
    high-throughput path for remote-attached TPUs and the benchmark
    harness (no reference equivalent; the reference dispatches per
    iteration, train_model.py:937-950).

    `k_real` (traced int32 scalar) masks the tail: scan steps with
    index >= k_real leave params/opt_state/step untouched, so the FINAL
    short dispatch of a run can be padded to the compiled K (no K'
    recompile) without applying phantom updates. The masking select is
    elementwise over the parameter tree (~3 reads + 1 write of ~12M
    floats per step — sub-1% of a step at the bench config). Metrics for
    masked steps are garbage; callers slice [:k_real].

    `spatial_parallel=True` additionally shards the image HEIGHT axis
    over the mesh's `model` axis (same semantics/guard as
    `make_train_step`), so K-step dispatch composes with spatial
    sharding.
    """

    def multi_step(state: TrainState, batches, iter0, rng, k_real):
        k_total = batches[0].shape[0]
        ks = jnp.arange(k_total)

        def body(state, xs):
            k, batch = xs
            active = k < k_real
            # Per-step key = fold_in(base, ABSOLUTE iteration): the
            # scheduled-sampling stream is then invariant to the
            # steps-per-dispatch grouping AND to checkpoint/resume
            # boundaries (the caller passes the same base key every
            # call). iter0 arrives as f32 (exact for iterations < 2^24).
            grads, metrics = _grads_and_metrics(
                state.params, cfg, batch,
                iter0 + k.astype(jnp.float32),
                jax.random.fold_in(rng, iter0.astype(jnp.int32) + k),
                remat, grad_accum, grad_accum_unroll)
            updates, new_opt = optimizer.update(grads, state.opt_state,
                                                state.params)
            new_params = optax.apply_updates(state.params, updates)
            keep = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(active, a, b), new, old)
            out = {"loss": metrics["loss"],
                   "psnr_all": metrics["psnr_all"]}
            new_state = TrainState(keep(new_params, state.params),
                                   keep(new_opt, state.opt_state),
                                   state.step + active.astype(jnp.int32))
            return new_state, out

        return jax.lax.scan(body, state, (ks, batches))

    if not _use_mesh(mesh):
        jitted = jax.jit(multi_step, donate_argnums=(0,))
    else:
        repl = NamedSharding(mesh, P())
        if spatial_parallel:
            _spatial_guard(cfg, mesh)
            img_sh = NamedSharding(mesh, P(None, None, mesh_lib.DATA_AXIS,
                                           mesh_lib.MODEL_AXIS))
            vec_sh = NamedSharding(mesh, P(None, None, mesh_lib.DATA_AXIS))
            batch_sh = (img_sh, vec_sh, vec_sh)
        else:
            bsh = NamedSharding(mesh, P(None, None, mesh_lib.DATA_AXIS))
            batch_sh = (bsh, bsh, bsh)
        jitted = jax.jit(
            multi_step,
            in_shardings=(repl, batch_sh, repl, repl, repl),
            out_shardings=(repl, repl),
            donate_argnums=(0,),
        )

    def call(state, batches, iter0, rng, k_real=None):
        if k_real is None:
            k_real = batches[0].shape[0]
        return jitted(state, batches, iter0, rng, jnp.int32(k_real))

    return call


# What validation actually consumes (training/loop.run_validation): the
# per-(frame, sequence) metric matrices. Selecting them here lets XLA
# dead-code-eliminate everything validation never reads — and, in the
# multi-host path below where outputs are replicated, stops the step from
# all-gathering the entire generated video (gen_images is (T-1,B,H,W,C))
# per eval batch.
_EVAL_METRIC_KEYS = ("recon_mse_tb", "state_mse_tb", "ssim_tb")


def make_eval_step(cfg: ModelConfig, mesh: Optional[Mesh] = None,
                   spatial_parallel: bool = False,
                   keys: Optional[Tuple[str, ...]] = _EVAL_METRIC_KEYS):
    """Validation step: train=False (feed-self rollout) returning the
    selected rollout keys (default: the validation metric matrices;
    pass keys=None for the full rollout dict incl. generated images —
    the inference path). `spatial_parallel` matches make_train_step:
    image height sharded over `model`."""

    def eval_step(params, batch, rng):
        images, actions, states = batch
        out = predictor.rollout(params, cfg, images, actions, states,
                                jnp.float32(0.0), rng, train=False)
        return out if keys is None else {k: out[k] for k in keys}

    if not _use_mesh(mesh):
        return jax.jit(eval_step)

    repl = NamedSharding(mesh, P())
    if spatial_parallel:
        _spatial_guard(cfg, mesh)
    img_sh, vec_sh, _ = mesh_lib.batch_shardings(
        mesh, spatial=spatial_parallel)
    kwargs = {}
    if jax.process_count() > 1:
        # Multi-host: validation fetches the per-(frame, sequence)
        # metric matrices on every process; batch-sharded outputs would
        # span non-addressable devices, so replicate them (XLA inserts
        # the all-gather).
        kwargs["out_shardings"] = repl
    return jax.jit(eval_step,
                   in_shardings=(repl, (img_sh, vec_sh, vec_sh), repl),
                   **kwargs)
