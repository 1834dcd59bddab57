import pytest

pytestmark = pytest.mark.heavy

"""Serving-artifact export: serialize the feed-self rollout via
jax.export, reload it WITHOUT model code, and check bit-identical
outputs vs the live function."""

import numpy as np
import jax
import jax.numpy as jnp

from pivp_tpu.config import ModelConfig
from pivp_tpu.data import dataset as dataset_lib
from pivp_tpu.data import synthetic
from pivp_tpu.inference import export as export_lib
from pivp_tpu.models import predictor


def tiny_cfg(**kw):
    base = dict(image_height=16, image_width=16, sequence_length=4,
                context_frames=2, num_masks=3)
    base.update(kw)
    return ModelConfig(**base)


def test_export_roundtrip_matches_live(tmp_path):
    cfg = tiny_cfg()
    b = 2
    params = predictor.init_params(jax.random.PRNGKey(1), cfg)
    path = str(tmp_path / "serve.jaxexport")
    export_lib.export_serving_artifact(params, cfg, b, path)

    imgs, acts, stas = synthetic.generate_sequences(
        b, cfg.sequence_length, 16, 16)
    images, actions, states = dataset_lib.to_time_major(imgs, acts, stas)
    ctx_images = jnp.asarray(images[:cfg.context_frames])
    actions = jnp.asarray(actions[:-1])
    state0 = jnp.asarray(states[0])

    live = export_lib.make_serve_fn(params, cfg)
    want = np.asarray(jax.jit(live)(ctx_images, actions, state0))

    serve = export_lib.load_serving_artifact(path)
    got = np.asarray(serve(ctx_images, actions, state0))

    assert got.dtype == np.uint8
    assert got.shape == (cfg.sequence_length - cfg.context_frames, b,
                         16, 16, 3)
    np.testing.assert_array_equal(got, want)


def test_export_cli(tmp_path):
    from click.testing import CliRunner

    from pivp_tpu.inference import export_cli
    from pivp_tpu.utils import checkpoint as ckpt_lib

    cfg = tiny_cfg()
    params = predictor.init_params(jax.random.PRNGKey(2), cfg)
    run_dir = tmp_path / "models" / "20260816-000000-CDNA-2"
    run_dir.mkdir(parents=True)
    ckpt_lib.save_npz(str(run_dir / "training-final"),
                      jax.device_get(params))
    out = str(tmp_path / "artifact.jaxexport")

    r = CliRunner().invoke(export_cli.main, [
        "20260816-000000-CDNA-2", "training-final.npz", out,
        "--models_dir", str(tmp_path / "models"), "--batch", "2",
        "--num_masks", "3", "--sequence_length", "4",
        "--image_height", "16", "--image_width", "16"])
    assert r.exit_code == 0, r.output

    serve = export_lib.load_serving_artifact(out)
    images = jnp.zeros((2, 2, 16, 16, 3), jnp.float32)
    actions = jnp.zeros((3, 2, 5), jnp.float32)
    state0 = jnp.zeros((2, 5), jnp.float32)
    frames = np.asarray(serve(images, actions, state0))
    assert frames.shape == (2, 2, 16, 16, 3)
    assert frames.dtype == np.uint8


def test_http_serving_example(tmp_path):
    """examples/serve_http.py serves an exported artifact end to end:
    health check, a predict round-trip matching the live function, and a
    400 on malformed input."""
    import io
    import sys
    import threading
    import urllib.request
    import urllib.error

    sys.path.insert(0, "examples")
    import serve_http

    cfg = tiny_cfg()
    b = 2
    params = predictor.init_params(jax.random.PRNGKey(4), cfg)
    path = str(tmp_path / "serve.jaxexport")
    export_lib.export_serving_artifact(params, cfg, b, path)

    httpd = serve_http.make_server(path, port=0)  # ephemeral port
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    try:
        host, port = httpd.server_address
        base = f"http://{host}:{port}"
        assert urllib.request.urlopen(
            base + "/healthz").read() == b"ok"

        imgs, acts, stas = synthetic.generate_sequences(
            b, cfg.sequence_length, 16, 16)
        images, actions, states = dataset_lib.to_time_major(
            imgs, acts, stas)
        payload = io.BytesIO()
        np.savez(payload, images=images[:cfg.context_frames],
                 actions=actions[:-1], state0=states[0])
        resp = urllib.request.urlopen(urllib.request.Request(
            base + "/predict", data=payload.getvalue(), method="POST"))
        with np.load(io.BytesIO(resp.read())) as z:
            frames = z["frames"]

        live = export_lib.make_serve_fn(params, cfg)
        want = np.asarray(jax.jit(live)(
            jnp.asarray(images[:cfg.context_frames]),
            jnp.asarray(actions[:-1]), jnp.asarray(states[0])))
        np.testing.assert_array_equal(frames, want)

        try:
            urllib.request.urlopen(urllib.request.Request(
                base + "/predict", data=b"not-an-npz", method="POST"))
            raise AssertionError("malformed input must 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        httpd.shutdown()
