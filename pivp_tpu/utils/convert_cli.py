"""Checkpoint migration CLI: reference (Chainer) npz layout <-> this
framework's parameter layout.

A user of the reference (/root/reference) can bring a trained
`serializers.save_npz(Model)` checkpoint here (`import`), or ship a
checkpoint trained here back to reference tooling (`export`). The layout
mapping (NCHW<->NHWC weights, CHW-flat<->HWC-flat linear inputs, LN
gamma/beta reshapes) lives in utils/checkpoint.py:convert_reference_npz /
export_reference_npz and is oracle-gated by tests/test_reference_parity.py
(<0.1 dB PSNR on 10-step rollouts).

Usage:
  python -m pivp_tpu.utils.convert_cli import chainer.npz ours.npz \
      --model_type CDNA --num_masks 10
  python -m pivp_tpu.utils.convert_cli export ours.npz chainer.npz \
      --model_type CDNA --num_masks 10
"""

from __future__ import annotations

import logging

import click

from pivp_tpu.utils import logging_utils

logger = logging.getLogger(__name__)


def _model_options(f):
    opts = [
        click.option('--model_type', type=click.STRING, default='CDNA',
                     help='CDNA, DNA, or STP.'),
        click.option('--num_masks', type=click.INT, default=10,
                     help='Number of masks, usually 1 for DNA, 10 for '
                          'CDNA, STP.'),
        click.option('--use_state', type=click.INT, default=1),
        click.option('--image_height', type=click.INT, default=64),
        click.option('--image_width', type=click.INT, default=64),
    ]
    for o in reversed(opts):
        f = o(f)
    return f


def _cfg(model_type, num_masks, use_state, image_height, image_width):
    from pivp_tpu.config import ModelConfig

    return ModelConfig(model_type=model_type, num_masks=num_masks,
                       use_state=bool(use_state),
                       image_height=image_height, image_width=image_width)


@click.group()
def main():
    """Convert checkpoints between the reference Chainer npz layout and
    this framework's layout."""
    logging_utils.setup_logging()


@main.command('import')
@click.argument('src', type=click.Path(exists=True))
@click.argument('dst', type=click.Path())
@_model_options
def import_(src, dst, model_type, num_masks, use_state, image_height,
            image_width):
    """Chainer-layout SRC npz -> framework-layout DST npz."""
    import jax

    from pivp_tpu.models import predictor
    from pivp_tpu.utils import checkpoint as ckpt_lib

    cfg = _cfg(model_type, num_masks, use_state, image_height, image_width)
    template = predictor.init_params(jax.random.PRNGKey(0), cfg)
    params = ckpt_lib.convert_reference_npz(src, cfg, template)
    ckpt_lib.save_npz(dst, params)
    logger.info('Imported %s -> %s (%s layout validated against the '
                '%s parameter tree)', src, dst, 'Chainer', model_type)


@main.command('export')
@click.argument('src', type=click.Path(exists=True))
@click.argument('dst', type=click.Path())
@_model_options
def export_(src, dst, model_type, num_masks, use_state, image_height,
            image_width):
    """Framework-layout SRC npz -> Chainer-layout DST npz."""
    import jax

    from pivp_tpu.models import predictor
    from pivp_tpu.utils import checkpoint as ckpt_lib

    cfg = _cfg(model_type, num_masks, use_state, image_height, image_width)
    template = predictor.init_params(jax.random.PRNGKey(0), cfg)
    params = ckpt_lib.load_npz_into(src, template)
    ckpt_lib.export_reference_npz(dst, cfg, params)
    logger.info('Exported %s -> %s in the reference npz key layout', src,
                dst)


if __name__ == '__main__':
    main()
