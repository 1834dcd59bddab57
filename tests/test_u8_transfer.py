"""uint8 host->device image transfer: on-device dequantization must match
host-side f32 within quantization error, and training must work."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pivp_tpu.config import ModelConfig, TrainConfig
from pivp_tpu.data import dataset as dataset_lib
from pivp_tpu.data import synthetic
from pivp_tpu.models import predictor


def test_u8_rollout_matches_f32_rollout():
    cfg = ModelConfig(image_height=16, image_width=16, sequence_length=4,
                      context_frames=2, num_masks=3)
    params = predictor.init_params(jax.random.PRNGKey(0), cfg)
    imgs, acts, stas = synthetic.generate_sequences(4, 4, 16, 16)
    images, actions, states = dataset_lib.to_time_major(imgs, acts, stas)

    # Exactly u8-representable frames (like the real dataset).
    images_u8 = np.clip(images * 255.0 + 0.5, 0, 255).astype(np.uint8)
    images_f32 = images_u8.astype(np.float32) / 255.0

    o_u8 = predictor.rollout(params, cfg, jnp.asarray(images_u8),
                             jnp.asarray(actions), jnp.asarray(states),
                             jnp.float32(0.0), jax.random.PRNGKey(1),
                             train=False)
    o_f32 = predictor.rollout(params, cfg, jnp.asarray(images_f32),
                              jnp.asarray(actions), jnp.asarray(states),
                              jnp.float32(0.0), jax.random.PRNGKey(1),
                              train=False)
    np.testing.assert_allclose(np.asarray(o_u8["gen_images"]),
                               np.asarray(o_f32["gen_images"]),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(float(o_u8["loss"]), float(o_f32["loss"]),
                               rtol=1e-5)


@pytest.mark.heavy
def test_training_loop_with_u8_transfer(tmp_path):
    from pivp_tpu.training import loop

    arrays = synthetic.generate_sequences(8, 4, 16, 16)
    cfg = TrainConfig(
        num_iterations=4, batch_size=4, sequence_length=4,
        context_frames=2, num_masks=3, train_val_split=0.75,
        validation_interval=1, save_interval=100,
        output_dir=str(tmp_path), image_height=16, image_width=16,
        u8_transfer=True)
    result = loop.run_training(cfg, arrays=arrays)
    assert np.isfinite(result["global_losses"]).all()
