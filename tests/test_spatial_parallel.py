"""Spatial (height-axis) sharding over the mesh's model axis: GSPMD must
partition the convs (halo exchanges) and produce the same results as the
unsharded step. Undersized shards (conv halo >= shard rows) are rejected
— GSPMD silently truncates halos there."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.heavy

from pivp_tpu.config import ModelConfig
from pivp_tpu.data import dataset as dataset_lib
from pivp_tpu.data import synthetic
from pivp_tpu.parallel import mesh as mesh_lib
from pivp_tpu.parallel import train_step as ts_lib


def test_spatial_parallel_matches_unsharded_64x64():
    cfg = ModelConfig(sequence_length=3, context_frames=1, num_masks=3,
                      scheduled_sampling_k=-1.0)  # 64x64 default
    opt = ts_lib.make_optimizer(1e-3)
    imgs, acts, stas = synthetic.generate_sequences(4, 3, 64, 64)
    batch = dataset_lib.to_time_major(imgs, acts, stas)

    state1 = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step1 = ts_lib.make_train_step(cfg, opt, mesh=None)
    s1, m1 = step1(state1, batch, jnp.float32(0.0), jax.random.PRNGKey(1))

    # 4-way data x 2-way spatial mesh on the virtual CPU devices.
    mesh = mesh_lib.make_mesh(model_parallel=2)
    assert mesh.shape[mesh_lib.MODEL_AXIS] == 2
    state2 = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step2 = ts_lib.make_train_step(cfg, opt, mesh, spatial_parallel=True)
    img_sh = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "data", "model"))
    vec_sh = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "data"))
    sharded = (jax.device_put(batch[0], img_sh),
               jax.device_put(batch[1], vec_sh),
               jax.device_put(batch[2], vec_sh))
    s2, m2 = step2(state2, sharded, jnp.float32(0.0),
                   jax.random.PRNGKey(1))

    # The sharp halo-bug detector: train-step loss (diverged by 0.5%
    # under the GSPMD halo-truncation bug) and the eval rollout images
    # (diverged by O(0.3)). Per-element post-Adam params are NOT compared
    # — Adam updates are lr-bounded and sign-like near zero gradient, so
    # they add noise without detection power.
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-4)

    from pivp_tpu.models import predictor

    def gen(params, im, ac, st):
        return predictor.rollout(params, cfg, im, ac, st,
                                 jnp.float32(0.0), jax.random.PRNGKey(0),
                                 train=False)["gen_images"]

    # Fresh params — the train steps above donated their states.
    params = predictor.init_params(jax.random.PRNGKey(0), cfg)
    g1 = jax.jit(gen)(params, *batch)
    repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    g2 = jax.jit(gen, in_shardings=(repl, img_sh, vec_sh, vec_sh))(
        jax.device_put(params, repl), *sharded)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_spatial_parallel_rejects_undersized_shards():
    """16x16 images leave only 2 rows/shard at H/8 with 2-way model
    sharding — below the conv halo; must be rejected loudly."""
    cfg = ModelConfig(image_height=16, image_width=16, sequence_length=4,
                      context_frames=2, num_masks=3)
    opt = ts_lib.make_optimizer(1e-3)
    mesh = mesh_lib.make_mesh(model_parallel=2)
    with pytest.raises(ValueError, match="rows per shard"):
        ts_lib.make_train_step(cfg, opt, mesh, spatial_parallel=True)


def test_spatial_parallel_4way_128x128_eval():
    """4-way height sharding at 128x128 (2 data x 4 model on the 8
    virtual devices): the deepest stage keeps 128/8/4 = 4 rows per shard
    — exactly at the halo guard's floor — and the sharded feed-self
    rollout must match the unsharded one through every halo exchange."""
    cfg = ModelConfig(sequence_length=2, context_frames=1, num_masks=3,
                      scheduled_sampling_k=-1.0, image_height=128,
                      image_width=128)
    imgs, acts, stas = synthetic.generate_sequences(2, 2, 128, 128)
    batch = dataset_lib.to_time_major(imgs, acts, stas)

    mesh = mesh_lib.make_mesh(model_parallel=4)
    assert mesh.shape[mesh_lib.MODEL_AXIS] == 4
    # The guard must accept 4 rows/shard at the deepest stage.
    opt = ts_lib.make_optimizer(1e-3)
    ts_lib.make_train_step(cfg, opt, mesh, spatial_parallel=True)

    from pivp_tpu.models import predictor

    def gen(params, im, ac, st):
        return predictor.rollout(params, cfg, im, ac, st,
                                 jnp.float32(0.0), jax.random.PRNGKey(0),
                                 train=False)["gen_images"]

    params = predictor.init_params(jax.random.PRNGKey(0), cfg)
    g1 = jax.jit(gen)(params, *batch)

    img_sh = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "data", "model"))
    vec_sh = jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec(None, "data"))
    repl = jax.sharding.NamedSharding(mesh, jax.sharding.PartitionSpec())
    sharded = (jax.device_put(batch[0], img_sh),
               jax.device_put(batch[1], vec_sh),
               jax.device_put(batch[2], vec_sh))
    g2 = jax.jit(gen, in_shardings=(repl, img_sh, vec_sh, vec_sh))(
        jax.device_put(params, repl), *sharded)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                               rtol=1e-4, atol=1e-5)


def test_spatial_k_dispatch_matches_sequential():
    """make_train_multi(spatial_parallel=True): K height-sharded steps in
    one dispatch must match K sequential UNSHARDED single steps — gates
    the composition of K-step dispatch with GSPMD spatial partitioning
    (halo exchanges inside a lax.scan body)."""
    cfg = ModelConfig(sequence_length=3, context_frames=1, num_masks=3,
                      scheduled_sampling_k=-1.0)  # 64x64 default
    opt = ts_lib.make_optimizer(1e-3)
    k, b = 2, 4
    imgs, acts, stas = synthetic.generate_sequences(b * k, 3, 64, 64)
    per_step = [
        dataset_lib.to_time_major(imgs[i * b:(i + 1) * b],
                                  acts[i * b:(i + 1) * b],
                                  stas[i * b:(i + 1) * b])
        for i in range(k)]
    stacked = tuple(np.stack([s[i] for s in per_step]) for i in range(3))
    rng = jax.random.PRNGKey(5)

    state1 = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    step = ts_lib.make_train_step(cfg, opt, mesh=None)
    losses_seq = []
    for i in range(k):
        state1, m = step(state1, per_step[i], jnp.float32(i),
                         jax.random.fold_in(rng, i))
        losses_seq.append(float(m["loss"]))

    mesh = mesh_lib.make_mesh(4, model_parallel=2)  # 2 dp x 2 spatial
    state2 = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
    multi = ts_lib.make_train_multi(cfg, opt, mesh,
                                    spatial_parallel=True)
    sharded = jax.device_put(stacked,
                             mesh_lib.call_shardings(mesh, spatial=True))
    state2, m2 = multi(state2, sharded, jnp.float32(0.0), rng)
    np.testing.assert_allclose(np.asarray(m2["loss"]), losses_seq,
                               rtol=1e-4)


def test_spatial_grad_accum_matches_plain():
    """spatial_parallel x grad_accum: microbatched gradients under
    height sharding must equal the unaccumulated spatial step — gates
    the last untested cell of the parallelism-composition matrix
    (dp x spatial x grad_accum; dp x grad_accum lives in
    test_train_multi, dp x spatial above)."""
    cfg = ModelConfig(sequence_length=3, context_frames=1, num_masks=3,
                      scheduled_sampling_k=-1.0)  # 64x64 default
    opt = ts_lib.make_optimizer(1e-3)
    imgs, acts, stas = synthetic.generate_sequences(4, 3, 64, 64)
    batch = dataset_lib.to_time_major(imgs, acts, stas)

    mesh = mesh_lib.make_mesh(4, model_parallel=2)  # 2 dp x 2 spatial
    sharded = jax.device_put(batch,
                             mesh_lib.batch_shardings(mesh, spatial=True))

    losses = []
    for ga in (1, 2):
        state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
        step = ts_lib.make_train_step(cfg, opt, mesh,
                                      spatial_parallel=True, grad_accum=ga)
        _, m = step(state, sharded, jnp.float32(0.0),
                    jax.random.PRNGKey(1))
        losses.append(float(m["loss"]))
    # grad_accum reseeds each microbatch rng, but with k=-1 (feedself)
    # the rollout is sampling-free, so losses must agree exactly up to
    # reduction order.
    np.testing.assert_allclose(losses[0], losses[1], rtol=1e-5)


def test_loop_spatial_parallel_end_to_end(tmp_path):
    """The full training driver with --spatial_parallel 2: mesh layout,
    K-dispatch payload sharding, spatially-sharded validation. Per-step
    train losses must match the plain data-parallel run (same batch
    schedule; GSPMD partitioning is numerically equivalent)."""
    from pivp_tpu.config import TrainConfig
    from pivp_tpu.training import loop

    arrays = synthetic.generate_sequences(10, 3, 64, 64)
    base = dict(
        num_iterations=4, batch_size=4, sequence_length=3,
        context_frames=1, num_masks=3, train_val_split=0.8,
        validation_interval=1, save_interval=100,
        steps_per_call=2, prefetch=0, schedsamp_k=-1.0)
    r_sp = loop.run_training(
        TrainConfig(output_dir=str(tmp_path / "sp"), spatial_parallel=2,
                    **base), arrays=arrays)
    r_dp = loop.run_training(
        TrainConfig(output_dir=str(tmp_path / "dp"), **base),
        arrays=arrays)
    np.testing.assert_allclose(r_sp["global_losses"][:, 0],
                               r_dp["global_losses"][:, 0], rtol=1e-4)
