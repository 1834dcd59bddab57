"""Round-trip tests for the reference (Chainer npz) checkpoint converter:
export our params in the reference's NCHW key layout, re-import them, and
verify bit-identical parameters and rollout outputs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pivp_tpu.config import ModelConfig
from pivp_tpu.models import predictor
from pivp_tpu.utils import checkpoint as ckpt_lib


def tiny_cfg(**kw):
    base = dict(image_height=16, image_width=16, sequence_length=4,
                context_frames=2, num_masks=3)
    base.update(kw)
    return ModelConfig(**base)


@pytest.mark.parametrize("model_type,num_masks",
                         [("CDNA", 3), ("DNA", 1), ("STP", 3)])
def test_reference_layout_roundtrip(tmp_path, model_type, num_masks):
    cfg = tiny_cfg(model_type=model_type, num_masks=num_masks)
    params = predictor.init_params(jax.random.PRNGKey(3), cfg)
    path = str(tmp_path / "ref_layout.npz")
    ckpt_lib.export_reference_npz(path, cfg, jax.device_get(params))
    restored = ckpt_lib.convert_reference_npz(path, cfg, params)

    for (ka, a), (kb, b) in zip(
            sorted(ckpt_lib.flatten_pytree(params).items()),
            sorted(ckpt_lib.flatten_pytree(restored).items())):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=ka)


def test_roundtrip_preserves_rollout(tmp_path):
    cfg = tiny_cfg()
    params = predictor.init_params(jax.random.PRNGKey(3), cfg)
    path = str(tmp_path / "ref_layout.npz")
    ckpt_lib.export_reference_npz(path, cfg, jax.device_get(params))
    restored = ckpt_lib.convert_reference_npz(path, cfg, params)

    ks = jax.random.split(jax.random.PRNGKey(0), 3)
    images = jax.random.uniform(ks[0], (4, 2, 16, 16, 3))
    actions = jax.random.normal(ks[1], (4, 2, 5))
    states = jax.random.normal(ks[2], (4, 2, 5))
    o1 = predictor.rollout(params, cfg, images, actions, states,
                           jnp.float32(0.0), jax.random.PRNGKey(1),
                           train=False)
    o2 = predictor.rollout(restored, cfg, images, actions, states,
                           jnp.float32(0.0), jax.random.PRNGKey(1),
                           train=False)
    np.testing.assert_allclose(np.asarray(o1["gen_images"]),
                               np.asarray(o2["gen_images"]))


def test_convert_cli_roundtrip(tmp_path):
    """The migration CLI (import/export subcommands) round-trips a
    Chainer-layout checkpoint bit-exactly at the full 64x64 geometry."""
    from click.testing import CliRunner

    from pivp_tpu.utils import convert_cli

    cfg = ModelConfig(model_type="CDNA", num_masks=10)
    params = jax.device_get(predictor.init_params(jax.random.PRNGKey(7),
                                                  cfg))
    chainer_npz = str(tmp_path / "chainer.npz")
    ours_npz = str(tmp_path / "ours.npz")
    back_npz = str(tmp_path / "back.npz")
    ckpt_lib.export_reference_npz(chainer_npz, cfg, params)

    runner = CliRunner()
    r = runner.invoke(convert_cli.main,
                      ["import", chainer_npz, ours_npz,
                       "--model_type", "CDNA", "--num_masks", "10"])
    assert r.exit_code == 0, r.output
    r = runner.invoke(convert_cli.main,
                      ["export", ours_npz, back_npz,
                       "--model_type", "CDNA", "--num_masks", "10"])
    assert r.exit_code == 0, r.output

    with np.load(chainer_npz) as a, np.load(back_npz) as b:
        assert sorted(a.files) == sorted(b.files)
        for k in a.files:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)

    imported = ckpt_lib.load_npz_into(
        ours_npz, predictor.init_params(jax.random.PRNGKey(0), cfg))
    for (ka, a), (kb, b) in zip(
            sorted(ckpt_lib.flatten_pytree(params).items()),
            sorted(ckpt_lib.flatten_pytree(imported).items())):
        assert ka == kb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b),
                                      err_msg=ka)
