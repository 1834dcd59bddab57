"""Visualization / reporting: loss-curve plots, conv-filter grids and
layer-activation maps.

Capability parity with the reference visualizer
(/root/reference/src/visualization/visualize.py):
  * `Visualizer` with `plot_filters` / `plot_activation` / `plot_output`
    grid renderers (30-167);
  * training/validation loss-curve plotting from the saved
    `training-global_losses*.npy` stat arrays (242-296, 364-383);
  * checkpoint reload + short forward pass + per-layer activation grids
    from the captured conv_res (386-447).
"""

from __future__ import annotations

import logging
import math
import os
from typing import List, Optional

import numpy as np

import matplotlib
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

logger = logging.getLogger(__name__)


class Visualizer:
    """Grid renderers for filters, activations and outputs."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        os.makedirs(out_dir, exist_ok=True)

    def _grid(self, tiles: np.ndarray, title: str, path: str,
              cmap: str = "viridis") -> str:
        n = tiles.shape[0]
        cols = int(math.ceil(math.sqrt(n)))
        rows = int(math.ceil(n / cols))
        fig, axes = plt.subplots(rows, cols,
                                 figsize=(cols * 1.6, rows * 1.6))
        axes = np.atleast_1d(axes).ravel()
        for i, ax in enumerate(axes):
            ax.axis("off")
            if i < n:
                ax.imshow(tiles[i], cmap=cmap)
        fig.suptitle(title)
        fig.tight_layout()
        fig.savefig(path, dpi=120)
        plt.close(fig)
        return path

    def plot_filters(self, weights: np.ndarray, name: str) -> str:
        """Conv kernel grid. weights: (kh, kw, in, out) — one tile per
        output channel (mean over input channels)."""
        tiles = np.transpose(weights.mean(axis=2), (2, 0, 1))
        return self._grid(tiles, f"{name} filters",
                          os.path.join(self.out_dir,
                                       f"{name}-filters.png"))

    def plot_activation(self, activation: np.ndarray, name: str,
                        sample: int = 0) -> str:
        """Feature-map grid. activation: (B, H, W, C) — one tile per
        channel of one sample."""
        tiles = np.transpose(activation[sample], (2, 0, 1))
        return self._grid(tiles, f"{name} activations",
                          os.path.join(self.out_dir,
                                       f"{name}-activation.png"))

    def plot_output(self, images: np.ndarray, name: str) -> str:
        """RGB frame strip. images: (N, H, W, C) in [0, 1]."""
        imgs = np.clip(images, 0.0, 1.0)
        fig, axes = plt.subplots(1, len(imgs),
                                 figsize=(len(imgs) * 1.8, 2.0))
        for ax, img in zip(np.atleast_1d(axes).ravel(), imgs):
            ax.axis("off")
            ax.imshow(img)
        path = os.path.join(self.out_dir, f"{name}-output.png")
        fig.savefig(path, dpi=120)
        plt.close(fig)
        return path


def plot_loss_curves(save_dir: str, out_dir: Optional[str] = None
                     ) -> List[str]:
    """Plot mean±std train (and validation, if present) loss/PSNR curves
    from the stat arrays written by the trainer (rows of
    [mean, std, min, max, median]; visualize.py:242-296 equivalents)."""
    out_dir = out_dir or save_dir
    os.makedirs(out_dir, exist_ok=True)
    written = []
    curves = {
        "training-global_losses.npy": "train loss",
        "training-global_losses_valid.npy": "validation loss",
        "training-global_psnr_all.npy": "train PSNR",
        "training-global_psnr_all_valid.npy": "validation PSNR",
    }
    for fname, label in curves.items():
        path = os.path.join(save_dir, fname)
        if not os.path.exists(path):
            continue
        arr = np.load(path)
        if arr.size == 0:
            continue
        mean, std = arr[:, 0], arr[:, 1]
        x = np.arange(len(mean))
        fig, ax = plt.subplots(figsize=(6, 4))
        ax.plot(x, mean, label=label)
        ax.fill_between(x, mean - std, mean + std, alpha=0.25)
        ax.set_xlabel("epoch")
        ax.set_ylabel(label)
        ax.legend()
        fig.tight_layout()
        out = os.path.join(out_dir, fname.replace(".npy", ".png"))
        fig.savefig(out, dpi=120)
        plt.close(fig)
        written.append(out)
    return written


ENC_NAMES = ("enc0", "enc1", "enc2", "enc3", "enc4", "enc5", "enc6",
             "enc7")


def project_activation(conv_w: np.ndarray, activation: np.ndarray,
                       stride: int, padding: int,
                       outsize) -> np.ndarray:
    """Deconv-project a (B, h, w, C_out) activation back to the input
    pixel space through the conv's OWN weights — the adjoint of the conv,
    exactly the reference's deconv-projection helper
    (visualize.py:432-438: `deconvolution_2d(x, conv.W, stride, pad,
    outsize=(64, 64))`). Returns (B, H, W, C_in)."""
    import jax.numpy as jnp

    from pivp_tpu.ops import layers

    # conv weight (kh, kw, in, out) -> deconv weight (kh, kw, out, in):
    # the activation's channels are the deconv's input channels.
    w = jnp.transpose(jnp.asarray(conv_w), (0, 1, 3, 2))
    p = {"w": w, "b": jnp.zeros((w.shape[-1],), w.dtype)}
    return np.asarray(layers.deconv2d(p, jnp.asarray(activation),
                                      stride=stride, padding=padding,
                                      outsize=tuple(outsize)))


def visualize_model(checkpoint_path: str, model_type: str,
                    images: np.ndarray, actions: np.ndarray,
                    states: np.ndarray, out_dir: str,
                    num_masks: int = 10, context_frames: int = 2,
                    use_state: bool = True,
                    all_timesteps: bool = False,
                    reference_literal: bool = False) -> List[str]:
    """Reload a checkpoint, run a short prediction with activation capture
    and render per-layer activation grids (visualize.py:386-447): the
    last timestep (the reference's Model.conv_res view) plus per-timestep
    grids — first/middle/last by default, every step with
    `all_timesteps=True` — and the enc0 deconv-projection back to pixel
    space (visualize.py:432-438)."""
    import jax
    import jax.numpy as jnp

    from pivp_tpu.inference import predict as predict_lib
    from pivp_tpu.models import predictor

    t = images.shape[0]
    cfg, params = predict_lib.load_model(
        checkpoint_path, model_type, num_masks, context_frames,
        use_state, -1.0, images.shape[1], images.shape[2], t,
        reference_literal=reference_literal)

    out = predictor.rollout(
        params, cfg, jnp.asarray(images)[:, None],
        jnp.asarray(actions).reshape(t, 1, -1),
        jnp.asarray(states).reshape(t, 1, -1),
        jnp.float32(0.0), jax.random.PRNGKey(0), train=False,
        capture=True)

    viz = Visualizer(out_dir)
    written = []
    # Last-timestep grids (reference conv_res view; stable filenames).
    for name, act in zip(ENC_NAMES, out["conv_res"]):
        written.append(viz.plot_activation(np.asarray(act), name))
    # Per-timestep grids.
    n_steps = int(out["gen_images"].shape[0])
    steps = (range(n_steps) if all_timesteps
             else sorted({0, n_steps // 2, n_steps - 1}))
    for name, acts in zip(ENC_NAMES, out["conv_res_all"]):
        acts = np.asarray(acts)                     # (T-1, B, h, w, C)
        for ti in steps:
            written.append(viz.plot_activation(
                acts[ti], f"{name}-t{ti}"))
    # enc0 activations projected to pixel space through enc0's weights.
    enc0_all = np.asarray(out["conv_res_all"][0])
    h, w = images.shape[1], images.shape[2]
    for ti in steps:
        proj = project_activation(np.asarray(params["enc0"]["w"]),
                                  enc0_all[ti], stride=2, padding=2,
                                  outsize=(h, w))[0]      # (H, W, C_in)
        lo, hi = proj.min(), proj.max()
        if hi > lo:
            proj = (proj - lo) / (hi - lo)
        written.append(viz.plot_output(proj[None],
                                       f"enc0-projected-t{ti}"))
    written.append(viz.plot_output(
        np.asarray(out["gen_images"])[:, 0], "prediction"))
    # Filter-weight grids for the conv trunk (Visualizer.plot_filters
    # capability of the reference, visualize.py:71-106).
    for name in ("enc0", "enc1", "enc2"):
        written.append(viz.plot_filters(
            np.asarray(params[name]["w"]), name))
    return written
