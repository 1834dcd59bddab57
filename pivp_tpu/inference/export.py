"""Serving artifact export: serialize the feed-self prediction rollout
(params baked in) as a portable StableHLO artifact via jax.export.

The reference has no deployment story beyond re-running predict_model.py
against a checkpoint. This produces a self-contained compiled-model
artifact a serving stack can load WITHOUT the model code: the artifact
carries the StableHLO module, the input/output tree structure, and the
lowering platform(s), and is versioned/stable across JAX releases
(jax.export serialization guarantees).

Contract of the exported function:
  serve(images (ctx, B, H, W, C) f32 [0,1],
        actions (T-1, B, A) — one action per predicted transition,
        state0 (B, S) — the initial end-effector state)
    -> predicted frames (T-ctx, B, H, W, C) uint8

Only the context frames are taken as image input — the rollout is pure
feed-self after warm start (predict semantics,
/root/reference/src/models/predict_model.py:126-128); later states are
model-predicted and fed back, so only state0 is needed. Outputs are
uint8-quantized on device so a server ships 4x less data per reply.
"""

from __future__ import annotations

import logging
from typing import Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)


def make_serve_fn(params, cfg):
    """Build serve(images, actions, state0) with params closed over.
    Shapes (including batch) are fixed later by the export specs."""
    import jax
    import jax.numpy as jnp

    from pivp_tpu.models import predictor
    from pivp_tpu.ops import transforms

    ctx = cfg.context_frames
    t = cfg.sequence_length

    def serve(images, actions, state0):
        # The rollout takes length-T frame/action/state stacks (it scans
        # the first T-1 and reads states[0] only); under feed-self just
        # the `ctx` context frames, the T-1 actions, and the initial
        # state matter — pad the rest with zeros so the exported
        # signature carries exactly the serving inputs.
        pad = jnp.zeros((t - ctx,) + images.shape[1:], jnp.float32)
        full = jnp.concatenate([images.astype(jnp.float32), pad], axis=0)
        acts = jnp.concatenate(
            [actions.astype(jnp.float32),
             jnp.zeros((1,) + actions.shape[1:], jnp.float32)], axis=0)
        stas = jnp.zeros((t,) + state0.shape, jnp.float32)
        stas = stas.at[0].set(state0.astype(jnp.float32))
        out = predictor.rollout(
            params, cfg, full, acts, stas, jnp.float32(0.0),
            jax.random.PRNGKey(0), train=False)
        gen = out["gen_images"][ctx - 1:]
        return transforms.quantize_frames_u8(gen)

    return serve


def export_serving_artifact(params, cfg, batch: int, path: str,
                            platforms: Optional[Sequence[str]] = None
                            ) -> None:
    """Serialize the serving rollout to `path` (.jaxexport bytes)."""
    import jax
    from jax import export as jax_export

    serve = make_serve_fn(params, cfg)
    ctx = cfg.context_frames
    t = cfg.sequence_length
    specs = (
        jax.ShapeDtypeStruct(
            (ctx, batch, cfg.image_height, cfg.image_width,
             cfg.color_channels), np.float32),
        jax.ShapeDtypeStruct((t - 1, batch, cfg.action_dim), np.float32),
        jax.ShapeDtypeStruct((batch, cfg.state_dim), np.float32),
    )
    exported = jax_export.export(
        jax.jit(serve),
        platforms=tuple(platforms) if platforms else None)(*specs)
    blob = exported.serialize()
    with open(path, "wb") as f:
        f.write(blob)
    logger.info("Exported %s serving artifact (%d bytes, platforms=%s) "
                "to %s", cfg.model_type, len(blob),
                exported.platforms, path)


def load_serving_artifact(path: str):
    """Deserialize an exported artifact; returns a callable
    f(images, actions, states) -> uint8 frames (runs under jax.jit)."""
    import jax
    from jax import export as jax_export

    with open(path, "rb") as f:
        exported = jax_export.deserialize(bytearray(f.read()))

    # Build the jitted wrapper ONCE — constructing it per call would
    # defeat jit's dispatch cache on the serving hot path.
    jitted = jax.jit(exported.call)

    def call(images, actions, state0):
        return jitted(images, actions, state0)

    call.exported = exported
    return call
