"""Export a trained checkpoint as a portable serving artifact.

Usage:
  python -m pivp_tpu.inference.export_cli MODEL_DIR MODEL_NAME OUT.jaxexport \\
      [--batch 32] [--platform tpu] [--model_type CDNA ...]

MODEL_DIR/MODEL_NAME follow the predict CLI conventions
(/root/reference/src/models/predict_model.py:57-76): the run directory
name `<date>-<time>-<TYPE>-<batch>` infers the model type unless
--model_type is given.
"""

from __future__ import annotations

import logging
import os

import click

from pivp_tpu.utils import logging_utils

logger = logging.getLogger(__name__)


@click.command()
@click.argument('model_dir', type=click.STRING)
@click.argument('model_name', type=click.STRING)
@click.argument('out_path', type=click.Path())
@click.option('--models_dir', type=click.Path(), default='models')
@click.option('--batch', type=click.INT, default=32,
              help='Serving batch size baked into the artifact.')
@click.option('--platform', type=click.STRING, multiple=True,
              help='Lowering platform(s), e.g. tpu, cpu. Repeatable; '
                   'default = the current JAX backend.')
@click.option('--model_type', type=click.STRING, default='')
@click.option('--num_masks', type=click.INT, default=10)
@click.option('--context_frames', type=click.INT, default=2)
@click.option('--sequence_length', type=click.INT, default=10)
@click.option('--use_state', type=click.INT, default=1)
@click.option('--image_height', type=click.INT, default=64)
@click.option('--image_width', type=click.INT, default=64)
def main(model_dir, model_name, out_path, models_dir, batch, platform,
         model_type, num_masks, context_frames, sequence_length,
         use_state, image_height, image_width):
    """Serialize MODEL_DIR/MODEL_NAME as a StableHLO serving artifact."""
    logging_utils.setup_logging()

    from pivp_tpu.inference import export as export_lib
    from pivp_tpu.inference import predict as predict_lib

    mt = model_type or predict_lib.infer_model_type(
        os.path.join(models_dir, model_dir))
    cfg, params = predict_lib.load_model(
        os.path.join(models_dir, model_dir, model_name), mt, num_masks,
        context_frames, bool(use_state), image_height=image_height,
        image_width=image_width, sequence_length=sequence_length)
    export_lib.export_serving_artifact(
        params, cfg, batch, out_path,
        platforms=list(platform) or None)
    logger.info('Wrote %s', out_path)


if __name__ == '__main__':
    main()
