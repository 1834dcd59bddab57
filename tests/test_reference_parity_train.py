"""Training-step parity gate vs the reference math (round-3 north star:
the backward pass, not just the forward).

The torch oracle (tests/chainer_oracle.py) autodiffs its float64 NCHW
reproduction of /root/reference/src/models/train_model.py and takes one
Chainer-Adam step (train_model.py:860-861). For each head we assert that
this framework's ACTUAL `train_step` machinery agrees:

  * loss (the scalar that is differentiated, train_model.py:736-764);
  * every parameter gradient, compared in the Chainer npz layout through
    the same converter mapping the forward gate uses
    (`export_reference_npz` on the gradient pytree — gradients permute
    exactly like the parameters they belong to);
  * the stop-gradient semantics of scheduled sampling: the reference's
    scheduled_sample round-trips through CPU numpy and detaches
    (train_model.py:89-122) — gated with num_ground_truth=0 (iter_num
    large) + detach_sampled=True vs the oracle's "detach" mode; the
    feedself path (k=-1) gates the full backprop-through-time chain;
  * one Adam update: chainer_adam reproduces the Chainer rule to f64
    round-off (isolated x64 check) and the full f32 `make_train_step`
    lands within float32 headroom of the oracle's updated parameters.
"""

import dataclasses
import math

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

pytestmark = pytest.mark.heavy

from pivp_tpu.config import ModelConfig
from pivp_tpu.parallel import train_step as ts_lib
from pivp_tpu.utils.checkpoint import export_reference_npz, flatten_pytree

from chainer_oracle import ChainerOracle
from test_reference_parity import _fixture_params, _fixture_batch, T, H, W

# iter_num chosen so num_ground_truth = round(B * k/(k+e^(i/k))) == 0 at
# k=900 (train_model.py:652-657): the scheduled-sampling mix is then
# deterministically "all generated rows", identically on both sides.
ITER_FOR_ZERO_GT = 20000.0


def _literal_cfg(model_type, **kw):
    return ModelConfig(
        model_type=model_type,
        num_masks=1 if model_type == "DNA" else 10,
        chainer_mask_scramble=True,
        dna_border_zero=(model_type == "DNA"),
        stp_shared_params=True,
        **kw)


def _jax_grads(cfg, params, batch, iter_num, x64: bool = False):
    """Gradients + loss from the framework's actual grad machinery.

    x64=True runs the model end-to-end in float64 (compute_dtype
    'float64' under jax_enable_x64) so the comparison against the f64
    torch oracle isolates SEMANTICS from float32 round-off."""
    def run():
        p = params
        if x64:
            p = jax.tree_util.tree_map(
                lambda a: np.asarray(a, np.float64), params)
        batch_j = tuple(jnp.asarray(a, jnp.float64 if x64 else None)
                        for a in batch)
        grads, metrics = ts_lib._grads_and_metrics(
            p, cfg, batch_j, jnp.asarray(float(iter_num)),
            jax.random.PRNGKey(0), remat=False, grad_accum=1)
        return jax.device_get(grads), float(metrics["loss"])

    if x64:
        with jax.enable_x64(True):
            return run()
    return run()


def _grad_table(cfg, grads, tmp_path):
    """Map the gradient pytree into the Chainer npz key layout via the
    same converter used for weights (gradients are covariant with their
    parameters under pure permutations/reshapes)."""
    path = str(tmp_path / "grads.npz")
    export_reference_npz(path, cfg, grads)
    with np.load(path) as data:
        return {k: np.asarray(v) for k, v in data.items()}


def _assert_grads_close(ref_grads, jax_grads, rtol, label):
    worst = (None, 0.0)
    for k, g_ref in ref_grads.items():
        g = jax_grads[k]
        assert g.shape == g_ref.shape, k
        denom = np.linalg.norm(g_ref)
        err = np.linalg.norm(g - g_ref) / (denom + 1e-30)
        if err > worst[1]:
            worst = (k, err)
        assert err < rtol, (
            f"[{label}] grad {k}: rel Frobenius error {err:.3e} >= {rtol}")
    return worst


@pytest.mark.parametrize("model_type,sampling", [
    ("CDNA", "detach"),
    ("CDNA", "feedself"),
    ("DNA", "detach"),
    ("STP", "detach"),
])
def test_train_step_gradient_parity(model_type, sampling, tmp_path):
    """f64-vs-f64: every parameter gradient < 1e-6 rel Frobenius error
    (measured ~1e-10; the VERDICT gate was 1e-4). The f32 production
    path's round-off is characterized separately by
    test_full_train_step_update_parity."""
    if sampling == "feedself":
        cfg = _literal_cfg(model_type, scheduled_sampling_k=-1.0,
                           compute_dtype="float64",
                           lstm_gate_compute="compute")
        iter_num = 0.0
    else:
        cfg = _literal_cfg(model_type, scheduled_sampling_k=900.0,
                           detach_sampled=True, compute_dtype="float64",
                           lstm_gate_compute="compute")
        iter_num = ITER_FOR_ZERO_GT

    params = _fixture_params(dataclasses.replace(
        cfg, compute_dtype="float32"))
    batch = _fixture_batch()
    images, actions, states = batch

    ckpt = str(tmp_path / "ref_layout.npz")
    export_reference_npz(ckpt, cfg, params)
    oracle = ChainerOracle(ckpt, model_type=model_type,
                           num_masks=cfg.num_masks, use_state=True,
                           context_frames=cfg.context_frames,
                           literal_quirks=True)
    ref = oracle.train_step(np.transpose(images, (0, 1, 4, 2, 3)),
                            actions, states, sampling=sampling)

    grads, loss = _jax_grads(cfg, params, batch, iter_num, x64=True)
    assert abs(loss - ref["loss"]) < 1e-9 * max(1.0, abs(ref["loss"])), (
        f"loss {loss} vs oracle {ref['loss']}")

    jax_grads = _grad_table(cfg, grads, tmp_path)
    # Every Chainer-layout key the oracle produced must exist and agree.
    assert set(ref["grads"].keys()) == set(jax_grads.keys())
    worst = _assert_grads_close(ref["grads"], jax_grads, rtol=1e-6,
                                label=f"{model_type}:{sampling}")
    print(f"[train-parity:{model_type}:{sampling}] loss d="
          f"{abs(loss - ref['loss']):.2e}, worst grad {worst[0]} "
          f"rel={worst[1]:.2e}")


def test_train_step_gradient_parity_stp_per_mask(tmp_path):
    """Gradient gate for the ONE head branch the shared-params gates never
    touch: stp_shared_params=False (distinct Linear(6) per mask — the
    original-TF semantics the reference quirked away at
    train_model.py:465-467). Intent mode, feedself sampling (full BPTT),
    f64 both sides; every per-mask projection must carry a DISTINCT,
    matching gradient."""
    cfg = ModelConfig(model_type="STP", num_masks=10,
                      stp_shared_params=False,
                      scheduled_sampling_k=-1.0,
                      compute_dtype="float64",
                      lstm_gate_compute="compute")

    params = _fixture_params(dataclasses.replace(
        cfg, compute_dtype="float32"))
    batch = _fixture_batch()
    images, actions, states = batch

    ckpt = str(tmp_path / "ref_layout.npz")
    export_reference_npz(ckpt, cfg, params)
    oracle = ChainerOracle(ckpt, model_type="STP", num_masks=10,
                           use_state=True,
                           context_frames=cfg.context_frames,
                           literal_quirks=False, stp_shared_params=False)
    ref = oracle.train_step(np.transpose(images, (0, 1, 4, 2, 3)),
                            actions, states, sampling="feedself")

    grads, loss = _jax_grads(cfg, params, batch, 0.0, x64=True)
    assert abs(loss - ref["loss"]) < 1e-9 * max(1.0, abs(ref["loss"]))

    jax_grads = _grad_table(cfg, grads, tmp_path)
    assert set(ref["grads"].keys()) == set(jax_grads.keys())
    # The fixed branch must be non-vacuous: per-mask gradients differ.
    g0 = jax_grads["model/identity_params_0/W"]
    g1 = jax_grads["model/identity_params_1/W"]
    assert np.linalg.norm(g0 - g1) > 1e-12 * (np.linalg.norm(g0) + 1e-30)
    worst = _assert_grads_close(ref["grads"], jax_grads, rtol=1e-6,
                                label="STP:per-mask:feedself")
    print(f"[train-parity:STP:per-mask] loss d="
          f"{abs(loss - ref['loss']):.2e}, worst grad {worst[0]} "
          f"rel={worst[1]:.2e}")


def test_detach_vs_feedself_gradients_differ(tmp_path):
    """The stop-gradient path must actually change the gradients (else the
    detach gate above would be vacuous)."""
    cfg_d = _literal_cfg("CDNA", scheduled_sampling_k=900.0,
                         detach_sampled=True)
    cfg_f = _literal_cfg("CDNA", scheduled_sampling_k=-1.0)
    params = _fixture_params(cfg_d)
    batch = _fixture_batch()
    g_d, _ = _jax_grads(cfg_d, params, batch, ITER_FOR_ZERO_GT)
    g_f, _ = _jax_grads(cfg_f, params, batch, 0.0)
    flat_d = flatten_pytree(g_d)
    flat_f = flatten_pytree(g_f)
    rel = max(
        np.linalg.norm(flat_d[k] - flat_f[k])
        / (np.linalg.norm(flat_f[k]) + 1e-30) for k in flat_f)
    assert rel > 1e-3, "detaching the fed-back frame changed nothing"


def test_chainer_adam_matches_chainer_rule_f64():
    """Isolated optimizer gate: chainer_adam applied to the oracle's f64
    gradients reproduces the Chainer update to f64 round-off, for several
    steps (bias-correction schedule included)."""
    rng = np.random.RandomState(0)
    with jax.enable_x64(True):
        params = {"a": jnp.asarray(rng.randn(7, 3)),
                  "b": jnp.asarray(rng.randn(11) * 1e-6)}
        opt = ts_lib.chainer_adam(1e-3)
        state = opt.init(params)

        # Independent numpy implementation of the Chainer rule.
        np_p = {k: np.asarray(v).copy() for k, v in params.items()}
        np_m = {k: np.zeros_like(v) for k, v in np_p.items()}
        np_v = {k: np.zeros_like(v) for k, v in np_p.items()}
        b1, b2, eps, lr = 0.9, 0.999, 1e-8, 1e-3

        for t in range(1, 5):
            grads = {k: jnp.asarray(rng.randn(*v.shape) *
                                    (1e-6 if k == "b" else 1.0))
                     for k, v in params.items()}
            updates, state = opt.update(grads, state, params)
            params = optax.apply_updates(params, updates)

            alpha_t = lr * math.sqrt(1 - b2 ** t) / (1 - b1 ** t)
            for k in np_p:
                g = np.asarray(grads[k])
                np_m[k] += (1 - b1) * (g - np_m[k])
                np_v[k] += (1 - b2) * (g * g - np_v[k])
                np_p[k] -= alpha_t * np_m[k] / (np.sqrt(np_v[k]) + eps)
                np.testing.assert_allclose(np.asarray(params[k]), np_p[k],
                                           rtol=1e-12, atol=1e-15)


def test_full_train_step_update_parity(tmp_path):
    """End-to-end: one f32 `make_train_step` (grads + chainer_adam update)
    lands on the oracle's f64 updated parameters.

    At t=1 Adam's update is ~lr*sign(g)/(1+eps/sqrt(v)) per element:
    elements whose |g| sits near the f32 gradient noise floor can
    legitimately flip sign (full 2*lr error), and small-|g| elements
    live in the eps-sensitive region where a ~1% f32 gradient error
    moves the update by several percent — so elementwise ratios are the
    wrong metric for the f32 path (semantics are gated elementwise in
    f64 by test_train_step_gradient_parity). This test checks WIRING of
    the full f32 train_step per tensor: update-direction cosine > 0.98
    (a wrong tensor / missing converter permutation / wrong scale gives
    cosine near 0) and every update bounded by lr. (Semantics are gated
    elementwise in f64 by
    test_train_step_gradient_parity; this test checks the WIRING of the
    full f32 train_step: grads reach the right tensors through the
    optimizer at the right scale.)"""
    cfg = _literal_cfg("CDNA", scheduled_sampling_k=900.0,
                       detach_sampled=True)
    params = _fixture_params(cfg)
    batch = _fixture_batch()
    images, actions, states = batch

    ckpt = str(tmp_path / "ref_layout.npz")
    export_reference_npz(ckpt, cfg, params)
    oracle = ChainerOracle(ckpt, model_type="CDNA", num_masks=10,
                           use_state=True, context_frames=2,
                           literal_quirks=True)
    ref = oracle.train_step(np.transpose(images, (0, 1, 4, 2, 3)),
                            actions, states, sampling="detach")

    opt = ts_lib.make_optimizer(1e-3)
    state = ts_lib.TrainState(params, opt.init(params), jnp.int32(0))
    step = ts_lib.make_train_step(cfg, opt)
    batch_j = tuple(jnp.asarray(a) for a in batch)
    new_state, _ = step(state, batch_j, jnp.float32(ITER_FOR_ZERO_GT),
                        jax.random.PRNGKey(0))

    new_npz = str(tmp_path / "new_params.npz")
    export_reference_npz(new_npz, cfg, jax.device_get(new_state.params))
    old_npz_tbl = dict(np.load(ckpt))
    alpha_t = 1e-3 * math.sqrt(1 - 0.999) / (1 - 0.9)
    with np.load(new_npz) as data:
        worst = (None, 0.0)
        for k, p_ref in ref["new_params"].items():
            p_new = np.asarray(data[k])
            upd_ref = (p_ref - old_npz_tbl[k].astype(np.float64)).ravel()
            upd = (p_new.astype(np.float64) - old_npz_tbl[k]).ravel()
            denom = (np.linalg.norm(upd) * np.linalg.norm(upd_ref) + 1e-30)
            cos = float(np.dot(upd, upd_ref) / denom)
            if 1.0 - cos > worst[1]:
                worst = (k, 1.0 - cos)
            assert cos > 0.98, f"update {k}: cosine {cos:.4f}"
            # Any element's update is bounded by lr: |upd| =
            # alpha_t*(1-b1)|g| / (sqrt((1-b2)g^2)+eps) <= lr exactly.
            assert np.all(np.abs(upd) <= 1e-3 * 1.01), k
    print(f"[train-parity:update] worst 1-cosine {worst[0]} "
          f"= {worst[1]:.2e}")
