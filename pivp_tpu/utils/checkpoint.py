"""Checkpointing: flat-npz save/load of parameter/optimizer pytrees, plus
a converter that ingests the reference's Chainer npz key layout for parity
testing.

Mirrors the reference's directory contract
(/root/reference/src/models/train_model.py:1023-1041): a timestamped
`<date>-<TYPE>-<batch>/` directory holding `training-<epoch>` (model),
`state-<epoch>` (optimizer), metric-curve `.npy` files, and a `version`
file stamping the git commit (874-885).
"""

from __future__ import annotations

import os
import subprocess
from typing import Any, Dict, Optional

import jax
import numpy as np


# ---------------------------------------------------------------------------
# Flat pytree <-> npz
# ---------------------------------------------------------------------------

def flatten_pytree(tree: Any, prefix: str = "") -> Dict[str, np.ndarray]:
    """Flatten a nested dict/list/tuple/namedtuple pytree into
    '/'-joined keys -> numpy arrays."""
    flat: Dict[str, np.ndarray] = {}
    paths = jax.tree_util.tree_flatten_with_path(tree)[0]
    for path, leaf in paths:
        key = prefix + "/".join(_path_str(p) for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def _path_str(entry) -> str:
    if hasattr(entry, "key"):
        return str(entry.key)
    if hasattr(entry, "idx"):
        return str(entry.idx)
    if hasattr(entry, "name"):
        return str(entry.name)
    return str(entry)


def save_npz(path: str, tree: Any) -> None:
    """Atomic: write to a temp file in the same directory, then
    os.replace — a signal or crash mid-write can never leave a truncated
    artifact at the final name (the graceful-preemption path saves while
    more SIGTERMs may arrive)."""
    out = path if path.endswith(".npz") else path + ".npz"
    tmp = out + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **flatten_pytree(tree))
    os.replace(tmp, out)


def load_npz_into(path: str, template: Any) -> Any:
    """Load a flat npz into the structure of `template` (same pytree def;
    arrays replaced by the stored values)."""
    with np.load(path) as data:
        flat = dict(data)
    paths, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in paths:
        key = "/".join(_path_str(p) for p in path)
        if key not in flat:
            raise KeyError(f"checkpoint missing key {key}")
        stored = flat[key]
        if stored.shape != np.shape(leaf):
            raise ValueError(f"shape mismatch for {key}: checkpoint "
                             f"{stored.shape} vs model {np.shape(leaf)}")
        leaves.append(stored.astype(np.asarray(leaf).dtype))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def npz_keys(path: str):
    """List checkpoint keys — the capability of the reference's
    models/npz_keys.py inspector."""
    with np.load(path) as data:
        return sorted(data.keys())


# ---------------------------------------------------------------------------
# Reference (Chainer) checkpoint ingestion
# ---------------------------------------------------------------------------

def convert_reference_npz(path: str, cfg, params_template: Any) -> Any:
    """Convert a reference Chainer `serializers.save_npz(Model)` checkpoint
    into this framework's parameter pytree, for output-parity testing.

    Layout mapping (Chainer NCHW -> ours NHWC):
      * conv W (out, in, kh, kw)   -> (kh, kw, in, out)   [transpose 2,3,1,0]
      * deconv W (in, out, kh, kw) -> (kh, kw, in, out)   [transpose 2,3,0,1]
      * linear W (out, in)         -> (in, out), with the input dim
        re-permuted from CHW-flat to HWC-flat where it consumes a feature
        map (cdna_kerns / stp_input on hidden5; train_model.py:289,321).
      * LayerNormalization gamma/beta (C*H*W,) -> (H, W, C).
    """
    with np.load(path) as data:
        ref = dict(data)

    from pivp_tpu.models.predictor import _resolutions  # local import

    (r0, r1, r2, r3) = _resolutions(cfg)
    lc = cfg.lstm_channels
    ln_shapes = {
        "norm_enc0": (*r1, cfg.enc_channels[0]),
        "norm_enc6": (*r0, cfg.enc_channels[6]),
        "hidden1": (*r1, lc[0]), "hidden2": (*r1, lc[1]),
        "hidden3": (*r2, lc[2]), "hidden4": (*r2, lc[3]),
        "hidden5": (*r3, lc[4]), "hidden6": (*r2, lc[5]),
        # lstm7 runs at H/2 resolution (r1), unlike lstm3-6.
        "hidden7": (*r1, lc[6]),
    }

    h8, w8 = r3

    def conv_w(name):
        return np.transpose(ref[name + "/W"], (2, 3, 1, 0))

    def deconv_w(name):
        return np.transpose(ref[name + "/W"], (2, 3, 0, 1))

    def ln(name, shape):
        c = shape[-1]
        h, w = shape[0], shape[1]
        gamma = ref[name + "/norm/gamma"].reshape(c, h, w)
        beta = ref[name + "/norm/beta"].reshape(c, h, w)
        return {"scale": np.transpose(gamma, (1, 2, 0)),
                "bias": np.transpose(beta, (1, 2, 0))}

    def linear(name, feature_shape=None):
        w = ref[name + "/W"]  # (out, in)
        if feature_shape is not None:
            c, h, w_ = feature_shape
            w = w.reshape(w.shape[0], c, h, w_).transpose(0, 2, 3, 1)
            w = w.reshape(w.shape[0], -1)
        return {"w": w.T, "b": ref[name + "/b"]}

    out: Dict[str, Any] = {}
    for i in range(4):
        out[f"enc{i}"] = {"w": conv_w(f"enc{i}"), "b": ref[f"enc{i}/b"]}
    for i in range(4, 7):
        out[f"enc{i}"] = {"w": deconv_w(f"enc{i}"), "b": ref[f"enc{i}/b"]}
    for i in range(1, 8):
        out[f"lstm{i}"] = {"w": conv_w(f"lstm{i}/conv"),
                           "b": ref[f"lstm{i}/conv/b"]}
    for name, shape in ln_shapes.items():
        out[name] = ln(name, shape)
    out["masks"] = {"w": deconv_w("masks"), "b": ref["masks/b"]}
    out["state_pred"] = linear("current_state")

    head: Dict[str, Any] = {}
    if cfg.is_cdna:
        head["enc7"] = {"w": deconv_w("model/enc7"),
                        "b": ref["model/enc7/b"]}
        head["cdna_kerns"] = linear("model/cdna_kerns",
                                    feature_shape=(lc[4], h8, w8))
    elif cfg.is_dna:
        head["enc7"] = {"w": deconv_w("model/enc7"),
                        "b": ref["model/enc7/b"]}
    else:  # STP
        head["enc7"] = {"w": deconv_w("model/enc7"),
                        "b": ref["model/enc7/b"]}
        head["stp_input"] = linear("model/stp_input",
                                   feature_shape=(lc[4], h8, w8))
        if cfg.stp_shared_params:
            head["identity_params"] = linear("model/identity_params")
        else:
            # Per-mask Linear(6) heads (the original-TF semantics the
            # reference quirked away at train_model.py:465-467); keys
            # follow export_reference_npz's fixed-branch layout.
            head["identity_params"] = [
                linear(f"model/identity_params_{i}")
                for i in range(cfg.num_masks - 1)]
    out["head"] = head

    # Validate against the template structure/shapes.
    flat_t = flatten_pytree(params_template)
    flat_o = flatten_pytree(out)
    for k, v in flat_t.items():
        if k not in flat_o:
            raise KeyError(f"converter missing {k}")
        if flat_o[k].shape != v.shape:
            raise ValueError(f"converted {k}: {flat_o[k].shape} != "
                             f"{v.shape}")
    return jax.tree_util.tree_map(
        lambda t, o: np.asarray(o, dtype=np.asarray(t).dtype),
        params_template, out)


def export_reference_npz(path: str, cfg, params: Any) -> None:
    """Inverse of `convert_reference_npz`: write this framework's params
    in the reference's Chainer npz key layout (NCHW weight conventions),
    so reference tooling can consume checkpoints trained here and the
    converter can be round-trip tested."""
    from pivp_tpu.models.predictor import _resolutions  # local import

    (r0, r1, r2, r3) = _resolutions(cfg)
    lc = cfg.lstm_channels
    h8, w8 = r3
    out: Dict[str, np.ndarray] = {}

    def put_conv(name, p):
        out[name + "/W"] = np.transpose(np.asarray(p["w"]), (3, 2, 0, 1))
        out[name + "/b"] = np.asarray(p["b"])

    def put_deconv(name, p):
        out[name + "/W"] = np.transpose(np.asarray(p["w"]), (2, 3, 0, 1))
        out[name + "/b"] = np.asarray(p["b"])

    def put_ln(name, p):
        scale = np.transpose(np.asarray(p["scale"]), (2, 0, 1)).reshape(-1)
        bias = np.transpose(np.asarray(p["bias"]), (2, 0, 1)).reshape(-1)
        out[name + "/norm/gamma"] = scale
        out[name + "/norm/beta"] = bias

    def put_linear(name, p, feature_shape=None):
        w = np.asarray(p["w"]).T  # (out, in)
        if feature_shape is not None:
            c, h, w_ = feature_shape
            w = w.reshape(w.shape[0], h, w_, c).transpose(0, 3, 1, 2)
            w = w.reshape(w.shape[0], -1)
        out[name + "/W"] = w
        out[name + "/b"] = np.asarray(p["b"])

    for i in range(4):
        put_conv(f"enc{i}", params[f"enc{i}"])
    for i in range(4, 7):
        put_deconv(f"enc{i}", params[f"enc{i}"])
    for i in range(1, 8):
        put_conv(f"lstm{i}/conv", params[f"lstm{i}"])
    for name in ("norm_enc0", "norm_enc6", "hidden1", "hidden2", "hidden3",
                 "hidden4", "hidden5", "hidden6", "hidden7"):
        put_ln(name, params[name])
    put_deconv("masks", params["masks"])
    put_linear("current_state", params["state_pred"])

    head = params["head"]
    put_deconv("model/enc7", head["enc7"])
    if cfg.is_cdna:
        put_linear("model/cdna_kerns", head["cdna_kerns"],
                   feature_shape=(lc[4], h8, w8))
    elif cfg.is_stp:
        put_linear("model/stp_input", head["stp_input"],
                   feature_shape=(lc[4], h8, w8))
        if cfg.stp_shared_params:
            put_linear("model/identity_params", head["identity_params"])
        else:
            for i, p in enumerate(head["identity_params"]):
                put_linear(f"model/identity_params_{i}", p)
    np.savez(path, **out)


# ---------------------------------------------------------------------------
# Run directory / provenance
# ---------------------------------------------------------------------------

def git_version() -> Optional[str]:
    """branch + commit provenance stamp (train_model.py:874-885)."""
    try:
        def run(args):
            return subprocess.run(["git"] + args, capture_output=True,
                                  text=True, check=True).stdout.strip()
        return run(["rev-parse", "--abbrev-ref", "HEAD"]) + "\n" + \
            run(["rev-parse", "HEAD"])
    except Exception:
        return None


def prepare_run_dir(output_dir: str, run_name: str) -> str:
    save_dir = os.path.join(output_dir, run_name)
    if not os.path.exists(save_dir):
        # exist_ok: in multi-host runs every process prepares the same
        # run directory on a shared filesystem (collective orbax saves).
        os.makedirs(save_dir, exist_ok=True)
        version = git_version()
        if version is not None:
            with open(os.path.join(save_dir, "version"), "w") as f:
                f.write(version + "\n")
    return save_dir
