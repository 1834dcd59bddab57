"""End-to-end inference + visualization: train tiny -> checkpoint ->
predict contact sheet / GIF -> activation grids + loss curves."""

import os

import numpy as np
import pytest

from pivp_tpu.config import TrainConfig
from pivp_tpu.data import synthetic
from pivp_tpu.inference import predict as predict_lib
from pivp_tpu.visualization import visualize as viz


@pytest.fixture(scope="module")
def trained_run(tmp_path_factory):
    from pivp_tpu.training import loop

    tmp = tmp_path_factory.mktemp("run")
    arrays = synthetic.generate_sequences(6, 4, 16, 16)
    cfg = TrainConfig(
        num_iterations=2, batch_size=4, sequence_length=4,
        context_frames=2, num_masks=3, model_type="CDNA",
        train_val_split=1.0, validation_interval=100, save_interval=100,
        output_dir=str(tmp), image_height=16, image_width=16)
    result = loop.run_training(cfg, arrays=arrays,
                               run_name="20260816-000000-CDNA-4")
    return result, str(tmp)


def test_infer_model_type():
    assert predict_lib.infer_model_type("20260816-000000-CDNA-4") == "CDNA"
    with pytest.raises(ValueError):
        predict_lib.infer_model_type("not-a-run")


def test_predict_and_render(trained_run, tmp_path):
    result, models_dir = trained_run
    # Build a processed data dir with the map.csv contract.
    data_dir = str(tmp_path / "data")
    synthetic.write_processed_dir(data_dir, num_sequences=2,
                                  sequence_length=4, height=16, width=16)

    out = predict_lib.predict_and_render(
        result["run_name"], "training-final.npz", 0,
        models_dir=models_dir, data_dir=data_dir, time_step=3,
        num_masks=3, image_height=16, image_width=16,
        original_image_height=16, original_image_width=16,
        downscale_factor=1.0, gif=True)
    assert os.path.exists(out)
    assert out.endswith(".gif")

    out_png = predict_lib.predict_and_render(
        result["run_name"], "training-final.npz", 1,
        models_dir=models_dir, data_dir=data_dir, time_step=3,
        num_masks=3, image_height=16, image_width=16,
        original_image_height=16, original_image_width=16,
        downscale_factor=1.0, gif=False)
    assert out_png.endswith(".png") and os.path.exists(out_png)


def test_frames_to_uint8_modes():
    frames = np.array([[[[-0.5]], [[0.5]]], [[[0.2]], [[2.0]]]],
                      np.float32)  # (2,2,1,1)
    clipped = predict_lib.frames_to_uint8(frames)
    assert clipped.min() == 0 and clipped.max() == 255
    renorm = predict_lib.frames_to_uint8(frames, renormalize=True)
    assert renorm[0].min() == 0 and renorm[0].max() == 255


def test_loss_curves_and_activations(trained_run, tmp_path):
    result, models_dir = trained_run
    save_dir = result["save_dir"]
    out_dir = str(tmp_path / "figs")

    written = viz.plot_loss_curves(save_dir, out_dir)
    assert any("global_losses" in w for w in written)
    assert all(os.path.exists(w) for w in written)

    imgs, acts, stas = synthetic.generate_sequences(1, 4, 16, 16)
    written = viz.visualize_model(
        os.path.join(save_dir, "training-final.npz"), "CDNA",
        imgs[0], acts[0], stas[0], out_dir, num_masks=3)
    assert all(os.path.exists(w) for w in written)
    # enc0..enc7 last-step grids (reference conv_res view).
    for name in viz.ENC_NAMES:
        assert any(w.endswith(f"{name}-activation.png") for w in written)
    # Per-timestep grids (first/middle/last of the 3-step rollout).
    for ti in (0, 1, 2):
        assert any(f"enc0-t{ti}-activation" in w for w in written)
    # enc0 deconv projection back to pixel space + filters + prediction.
    assert any("enc0-projected-t0" in w for w in written)
    assert any("filters" in w for w in written)
    assert any("prediction-output" in w for w in written)


def test_visualizer_filters(tmp_path):
    v = viz.Visualizer(str(tmp_path))
    w = np.random.RandomState(0).randn(5, 5, 3, 8).astype(np.float32)
    path = v.plot_filters(w, "enc0")
    assert os.path.exists(path)
