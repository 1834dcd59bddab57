"""Pallas x GSPMD: the TPU-default configuration (use_pallas=True) on a
multi-device mesh.

A Mosaic pallas_call has no built-in SPMD partitioning rule; without the
custom_partitioning rules in ops/pallas/local_apply.py, GSPMD all-gathers
sharded operands and every device runs the kernel on the FULL global batch
(verified: the compiled HLO carried an all-gather). These tests pin the
fixed behavior: batch-sharded operands stay sharded through the op (no
all-gather), values and gradients match the XLA shifted-stack reference,
and the full train step with the TPU-default ModelConfig (pallas ON, in
interpret mode so the CPU mesh can execute it) matches the pallas-off
step under dp AND dp x spatial sharding — closing the round-3 gap where
every sharded test ran with Pallas off."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from pivp_tpu.config import ModelConfig
from pivp_tpu.data import dataset as dataset_lib
from pivp_tpu.data import synthetic
from pivp_tpu.ops.pallas import local_apply as la
from pivp_tpu.parallel import mesh as mesh_lib
from pivp_tpu.parallel import train_step as ts_lib


def _rand_xw(b=8, h=16, w=16, c=3, kk=25, seed=0):
    rs = np.random.RandomState(seed)
    x = jnp.asarray(rs.rand(b, h, w, c), jnp.float32)
    wk = jnp.asarray(rs.rand(b, h, w, kk), jnp.float32)
    return x, wk


def test_batch_partitioned_forward_no_allgather():
    mesh = mesh_lib.make_mesh()          # 8-way data
    x, w = _rand_xw()
    ref = la.local_kernel_apply_reference(x, w)
    sh = NamedSharding(mesh, P("data"))
    jf = jax.jit(lambda x, w: la.local_kernel_apply(x, w, True),
                 in_shardings=(sh, sh), out_shardings=sh)
    out = jf(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)
    # The partitioning rule keeps the batch sharded: each device runs the
    # kernel on its local rows — no gather anywhere in the program.
    hlo = jf.lower(x, w).compile().as_text()
    assert "all-gather" not in hlo and "all-reduce" not in hlo


def test_batch_partitioned_gradients_no_allgather():
    mesh = mesh_lib.make_mesh()
    x, w = _rand_xw(seed=1)

    def loss(fn):
        return lambda x, w: jnp.sum(fn(x, w) ** 2)

    gref = jax.grad(loss(la.local_kernel_apply_reference),
                    argnums=(0, 1))(x, w)
    sh = NamedSharding(mesh, P("data"))
    jg = jax.jit(
        jax.grad(loss(lambda x, w: la.local_kernel_apply(x, w, True)),
                 argnums=(0, 1)),
        in_shardings=(sh, sh), out_shardings=(sh, sh))
    g = jg(x, w)
    for a, b in zip(g, gref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-4)
    hlo = jg.lower(x, w).compile().as_text()
    assert "all-gather" not in hlo and "all-reduce" not in hlo


def test_spatially_sharded_operands_stay_correct():
    """H-sharded operands (the spatial_parallel layout) are gathered over
    the model axis around the op — correct values, documented cost."""
    mesh = mesh_lib.make_mesh(model_parallel=2)   # 4 data x 2 model
    x, w = _rand_xw(seed=2)
    ref = la.local_kernel_apply_reference(x, w)
    sh = NamedSharding(mesh, P("data", "model"))
    out = jax.jit(lambda x, w: la.local_kernel_apply(x, w, True),
                  in_shardings=(sh, sh), out_shardings=sh)(x, w)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=1e-5)


def _tpu_default_like(**kw):
    """The TPU auto-resolved ModelConfig shape (pallas ON) made runnable
    on the CPU mesh: interpret-mode kernels, f32 numerics so the
    pallas-off comparison is tight."""
    base = dict(model_type="CDNA", num_masks=4, sequence_length=4,
                context_frames=2, image_height=16, image_width=16,
                scheduled_sampling_k=-1.0, use_pallas=True,
                pallas_interpret=True)
    base.update(kw)
    return ModelConfig(**base)


def _batch(cfg, b):
    imgs, acts, stas = synthetic.generate_sequences(
        b, cfg.sequence_length, cfg.image_height, cfg.image_width)
    return dataset_lib.to_time_major(imgs, acts, stas)


def test_train_step_pallas_dp_mesh_matches_pallas_off():
    cfg_on = _tpu_default_like()
    cfg_off = dataclasses.replace(cfg_on, use_pallas=False,
                                  pallas_interpret=False)
    opt = ts_lib.make_optimizer(1e-3)
    mesh = mesh_lib.make_mesh()          # 8-way data
    batch = _batch(cfg_on, 8)

    losses = {}
    for name, cfg in (("on", cfg_on), ("off", cfg_off)):
        state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
        step = ts_lib.make_train_step(cfg, opt, mesh)
        sharded = mesh_lib.shard_batch(mesh, batch)
        ls = []
        for i in range(2):
            state, m = step(state, sharded, jnp.float32(i),
                            jax.random.PRNGKey(1))
            ls.append(float(m["loss"]))
        losses[name] = ls
    np.testing.assert_allclose(losses["on"], losses["off"], rtol=1e-5)


def test_train_multi_pallas_dp_mesh_matches_pallas_off():
    cfg_on = _tpu_default_like()
    cfg_off = dataclasses.replace(cfg_on, use_pallas=False,
                                  pallas_interpret=False)
    opt = ts_lib.make_optimizer(1e-3)
    mesh = mesh_lib.make_mesh()
    k, b = 2, 8
    imgs, acts, stas = synthetic.generate_sequences(
        b * k, cfg_on.sequence_length, 16, 16)

    def stack(x):
        return np.ascontiguousarray(
            x.reshape(k, b, *x.shape[1:]).swapaxes(1, 2))

    batches = tuple(stack(np.asarray(a)) for a in (imgs, acts, stas))
    sh = NamedSharding(mesh, P(None, None, "data"))
    batches = jax.device_put(batches, sh)

    out = {}
    for name, cfg in (("on", cfg_on), ("off", cfg_off)):
        state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
        multi = ts_lib.make_train_multi(cfg, opt, mesh)
        _, m = multi(state, batches, jnp.float32(0.0),
                     jax.random.PRNGKey(1))
        out[name] = np.asarray(m["loss"], np.float64)
    np.testing.assert_allclose(out["on"], out["off"], rtol=1e-5)


@pytest.mark.heavy
def test_train_step_pallas_dp_x_spatial_matches_pallas_off():
    """The flagship composition: TPU-default pallas config under
    dp x 2-way spatial sharding (64x64 — the spatial guard's minimum)."""
    cfg_on = _tpu_default_like(image_height=64, image_width=64,
                               sequence_length=2, context_frames=1,
                               num_masks=2)
    cfg_off = dataclasses.replace(cfg_on, use_pallas=False,
                                  pallas_interpret=False)
    opt = ts_lib.make_optimizer(1e-3)
    mesh = mesh_lib.make_mesh(model_parallel=2)   # 4 data x 2 model
    batch = _batch(cfg_on, 4)
    img_sh = NamedSharding(mesh, P(None, "data", "model"))
    vec_sh = NamedSharding(mesh, P(None, "data"))
    sharded = (jax.device_put(batch[0], img_sh),
               jax.device_put(batch[1], vec_sh),
               jax.device_put(batch[2], vec_sh))

    losses = {}
    for name, cfg in (("on", cfg_on), ("off", cfg_off)):
        state = ts_lib.create_train_state(jax.random.PRNGKey(0), cfg, opt)
        step = ts_lib.make_train_step(cfg, opt, mesh,
                                      spatial_parallel=True)
        _, m = step(state, sharded, jnp.float32(0.0),
                    jax.random.PRNGKey(1))
        losses[name] = float(m["loss"])
    np.testing.assert_allclose(losses["on"], losses["off"], rtol=1e-5)


def test_model_overrides_exposes_pallas_interpret():
    from pivp_tpu.config import TrainConfig

    cfg = TrainConfig(use_pallas=1,
                      model_overrides=(("pallas_interpret", True),))
    mcfg = cfg.model_config()
    assert mcfg.use_pallas and mcfg.pallas_interpret
