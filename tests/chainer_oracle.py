"""Independent NCHW oracle of the reference Chainer model, for the golden
parity gate (BASELINE.json north star: <0.1 dB PSNR delta on 10-step
rollouts).

This is a from-scratch transcription of the *math* of
/root/reference/src/models/train_model.py into torch-on-CPU (float64),
NOT a port of this repo's JAX model: it keeps the reference's NCHW layout,
its flattened (C*H*W) LayerNorm, its literal mask-softmax reshape
(train_model.py:720-722), its DNA border re-zeroing (395-405), and its
shared STP Linear(6) (465-467). Weights are read directly from the
Chainer npz key layout (the format `serializers.save_npz(Model)` writes
and `pivp_tpu.utils.checkpoint.export_reference_npz` produces), so the
gate exercises the checkpoint converter as well as the model semantics.

Reference provenance per method:
  * layer_norm      -> LayerNormalizationConv2D, train_model.py:186-208
  * conv_lstm       -> BasicConvLSTMCell, train_model.py:216-276
  * cdna_head       -> StatelessCDNA, train_model.py:278-351
  * dna_head        -> StatelessDNA, train_model.py:354-417
  * stp_head        -> StatelessSTP, train_model.py:419-475
  * forward_step    -> Model.ops table, train_model.py:594-602, 683-700
  * composite       -> train_model.py:717-728
  * rollout / loss  -> train_model.py:620-764
  * st_grid/sampler -> chainer F.spatial_transformer_{grid,sampler}
                       semantics (align-corners grid; bilinear sampling of
                       a one-pixel zero-padded image with clipped
                       coordinates)
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import numpy as np
import torch
import torch.nn.functional as Ft

RELU_SHIFT = 1e-12
DNA_KERN_SIZE = 5


class ChainerOracle:
    """Evaluation-mode (feedself) forward of the reference model.

    Args:
      npz: path to a Chainer-layout npz checkpoint, or a dict of arrays.
      model_type: CDNA | DNA | STP.
      num_masks: compositing mask count (reference --num_masks).
      use_state: concatenate smeared state/action into the trunk.
      context_frames: warm-start length (num_frame_before_prediction).
      literal_quirks: True reproduces the Chainer port exactly (mask
        scramble + DNA border zeroing); False computes the original-TF
        "intent" semantics (NHWC-equivalent per-pixel mask softmax, true
        DNA shift windows) for intent-mode parity tests.
      stp_shared_params: True is the reference quirk — one Linear(6)
        reused for every mask so all warps are identical
        (train_model.py:465-467). False is the original-TF semantics:
        a distinct Linear(6) per mask, read from npz keys
        `model/identity_params_{i}` (the layout export_reference_npz
        writes for the fixed branch).
    """

    def __init__(self, npz, model_type: str = "CDNA", num_masks: int = 10,
                 use_state: bool = True, context_frames: int = 2,
                 literal_quirks: bool = True,
                 stp_shared_params: bool = True,
                 dtype: torch.dtype = torch.float64):
        if isinstance(npz, (str,)):
            with np.load(npz) as data:
                raw = {k: np.asarray(v) for k, v in data.items()}
        else:
            raw = {k: np.asarray(v) for k, v in npz.items()}
        self.p = {k: torch.as_tensor(v, dtype=dtype) for k, v in raw.items()}
        self.model_type = model_type
        self.num_masks = num_masks
        self.use_state = use_state
        self.context_frames = context_frames
        self.literal_quirks = literal_quirks
        self.stp_shared_params = stp_shared_params
        self.dtype = dtype

    # -- primitive layers (Chainer link semantics) ------------------------

    def conv(self, name: str, x: torch.Tensor, stride: int = 1,
             pad: int = 0) -> torch.Tensor:
        return Ft.conv2d(x, self.p[name + "/W"], self.p[name + "/b"],
                         stride=stride, padding=pad)

    def deconv(self, name: str, x: torch.Tensor, stride: int = 1,
               pad: int = 0,
               outsize: Optional[Tuple[int, int]] = None) -> torch.Tensor:
        w = self.p[name + "/W"]          # (in, out, kh, kw) Chainer layout
        k = w.shape[2]
        h, wid = x.shape[2], x.shape[3]
        base_h = (h - 1) * stride + k - 2 * pad
        base_w = (wid - 1) * stride + k - 2 * pad
        if outsize is None:
            outsize = (base_h, base_w)
        out_pad = (outsize[0] - base_h, outsize[1] - base_w)
        return Ft.conv_transpose2d(x, w, self.p[name + "/b"], stride=stride,
                                   padding=pad, output_padding=out_pad)

    def layer_norm(self, name: str, x: torch.Tensor,
                   eps: float = 1e-6) -> torch.Tensor:
        """LayerNormalizationConv2D: flatten (C,H,W) to one feature axis,
        normalize, per-element affine (train_model.py:203-208)."""
        b = x.shape[0]
        shape = x.shape
        flat = x.reshape(b, -1)
        mu = flat.mean(dim=1, keepdim=True)
        var = ((flat - mu) ** 2).mean(dim=1, keepdim=True)
        normed = (flat - mu) / torch.sqrt(var + eps)
        out = normed * self.p[name + "/norm/gamma"] \
            + self.p[name + "/norm/beta"]
        return out.reshape(shape)

    def linear(self, name: str, x: torch.Tensor) -> torch.Tensor:
        return x @ self.p[name + "/W"].T + self.p[name + "/b"]

    def conv_lstm(self, name: str, state, x: torch.Tensor,
                  forget_bias: float = 1.0):
        """BasicConvLSTMCell step (train_model.py:262-272)."""
        c, h = state
        if c is None:
            out_ch = self.p[name + "/conv/W"].shape[0] // 4
            zeros = torch.zeros((x.shape[0], out_ch, x.shape[2],
                                 x.shape[3]), dtype=self.dtype)
            c, h = zeros, zeros.clone()
        gates = self.conv(name + "/conv", torch.cat([x, h], dim=1),
                          stride=1, pad=2)
        j, i, f, o = torch.chunk(gates, 4, dim=1)
        c = c * torch.sigmoid(f + forget_bias) \
            + torch.sigmoid(i) * torch.tanh(j)
        h = torch.tanh(c) * torch.sigmoid(o)
        return (c, h), h

    # -- trunk (Model.ops table, train_model.py:594-602) ------------------

    def forward_step(self, lstm_states: List, prev_image: torch.Tensor,
                     state_action: torch.Tensor):
        relu = torch.relu
        s = list(lstm_states)

        # Stage 0: [enc0, norm_enc0] + relu.
        x = self.conv("enc0", prev_image, stride=2, pad=2)
        enc0 = relu(self.layer_norm("norm_enc0", x))
        # Stage 1: [lstm1, hidden1, lstm2, hidden2, enc1] + relu.
        s[0], h = self.conv_lstm("lstm1", s[0], enc0)
        hidden1 = self.layer_norm("hidden1", h)
        s[1], h = self.conv_lstm("lstm2", s[1], hidden1)
        hidden2 = self.layer_norm("hidden2", h)
        enc1 = relu(self.conv("enc1", hidden2, stride=2, pad=1))
        # Stage 2: [lstm3, hidden3, lstm4, hidden4, enc2] + relu.
        s[2], h = self.conv_lstm("lstm3", s[2], enc1)
        hidden3 = self.layer_norm("hidden3", h)
        s[3], h = self.conv_lstm("lstm4", s[3], hidden3)
        hidden4 = self.layer_norm("hidden4", h)
        enc2 = relu(self.conv("enc2", hidden4, stride=2, pad=1))
        # Stage 3: [smear, enc3] + relu (train_model.py:556-567).
        x = enc2
        if self.use_state:
            smear = state_action[:, :, None, None].expand(
                -1, -1, x.shape[2], x.shape[3])
            x = torch.cat([x, smear], dim=1)
        enc3 = relu(self.conv("enc3", x, stride=1, pad=0))
        # Stage 4: [lstm5, hidden5, enc4] + relu.
        s[4], h = self.conv_lstm("lstm5", s[4], enc3)
        hidden5 = self.layer_norm("hidden5", h)
        enc4 = relu(self.deconv("enc4", hidden5, stride=2, pad=1,
                                outsize=(2 * hidden5.shape[2],
                                         2 * hidden5.shape[3])))
        # Stage 5: [lstm6, hidden6, skip(enc1), enc5] + relu.
        s[5], h = self.conv_lstm("lstm6", s[5], enc4)
        hidden6 = self.layer_norm("hidden6", h)
        x = torch.cat([hidden6, enc1], dim=1)
        enc5 = relu(self.deconv("enc5", x, stride=2, pad=1,
                                outsize=(2 * x.shape[2], 2 * x.shape[3])))
        # Stage 6: [lstm7, hidden7, skip(enc0), enc6, norm_enc6] + relu.
        s[6], h = self.conv_lstm("lstm7", s[6], enc5)
        hidden7 = self.layer_norm("hidden7", h)
        x = torch.cat([hidden7, enc0], dim=1)
        x = self.deconv("enc6", x, stride=2, pad=1,
                        outsize=(2 * x.shape[2], 2 * x.shape[3]))
        enc6 = relu(self.layer_norm("norm_enc6", x))

        encs = [enc0, enc1, enc2, enc3, enc4, enc5, enc6]
        hiddens = [hidden1, hidden2, hidden3, hidden4, hidden5, hidden6,
                   hidden7]
        return s, encs, hiddens

    # -- heads -------------------------------------------------------------

    def cdna_head(self, encs, hiddens, prev_image):
        """StatelessCDNA (train_model.py:278-351): per-sample 5x5 kernels
        applied to every color channel via cross-correlation, pad 2."""
        b, c, h, w = prev_image.shape
        m = self.num_masks
        enc7 = torch.relu(self.deconv("model/enc7", encs[6], stride=1))
        transformed = [torch.sigmoid(enc7)]

        kerns = self.linear("model/cdna_kerns",
                            hiddens[4].reshape(b, -1))
        kerns = kerns.reshape(b, m, DNA_KERN_SIZE, DNA_KERN_SIZE)
        kerns = torch.relu(kerns - RELU_SHIFT) + RELU_SHIFT
        kerns = kerns / kerns.sum(dim=(2, 3), keepdim=True)

        # The reference's batch<->channel depthwise trick computes
        # out[m][b, c] = kern[b, m] (*) prev[b, c] (cross-correlation,
        # pad=2). Express it directly with grouped conv: batch as groups.
        img = prev_image.reshape(1, b * c, h, w)
        # groups=b*c, each group gets its sample's m kernels.
        weight = kerns[:, None].expand(b, c, m, DNA_KERN_SIZE,
                                       DNA_KERN_SIZE)
        weight = weight.reshape(b * c * m, 1, DNA_KERN_SIZE, DNA_KERN_SIZE)
        out = Ft.conv2d(img, weight, stride=1, padding=DNA_KERN_SIZE // 2,
                        groups=b * c)          # (1, b*c*m, H, W)
        out = out.reshape(b, c, m, h, w).permute(2, 0, 1, 3, 4)
        transformed += [out[i] for i in range(m)]
        return transformed, enc7

    def dna_head(self, encs, hiddens, prev_image):
        """StatelessDNA (train_model.py:354-417), including (in literal
        mode) the port's border re-zeroing at 395-405: each shift slices
        padded[k : size] (instead of k : k+size) and zero-pads the
        bottom/right tail back to size."""
        b, c, h, w = prev_image.shape
        k = DNA_KERN_SIZE
        enc7 = torch.relu(self.deconv("model/enc7", encs[6], stride=1))

        pad = k // 2
        padded = Ft.pad(prev_image, (pad, pad, pad, pad))
        shifts = []
        for xk in range(k):
            for yk in range(k):
                if self.literal_quirks:
                    tmp = padded[:, :, xk:h, yk:w]
                    tmp = Ft.pad(tmp, (0, yk, 0, xk))
                else:
                    tmp = padded[:, :, xk:xk + h, yk:yk + w]
                shifts.append(tmp[:, :, None])       # (B, C, 1, H, W)
        stack = torch.cat(shifts, dim=2)             # (B, C, K*K, H, W)

        kern = torch.relu(enc7 - RELU_SHIFT) + RELU_SHIFT
        kern = kern / kern.sum(dim=1, keepdim=True)  # (B, K*K, H, W)
        out = (stack * kern[:, None]).sum(dim=2)     # (B, C, H, W)
        return [out], enc7

    def stp_head(self, encs, hiddens, prev_image):
        """StatelessSTP (train_model.py:419-475): affine grid + bilinear
        sampler per mask. Shared mode reuses ONE Linear(6) so all warps
        are identical (the reference quirk at :465-467); per-mask mode is
        the original-TF semantics with a distinct Linear(6) per mask."""
        b = prev_image.shape[0]
        enc7 = self.deconv("model/enc7", encs[6], stride=1)
        transformed = [torch.sigmoid(enc7)]

        feat = torch.relu(self.linear("model/stp_input",
                                      hiddens[4].reshape(b, -1)))
        identity = torch.tensor([1.0, 0.0, 0.0, 0.0, 1.0, 0.0],
                                dtype=self.dtype)
        for i in range(self.num_masks - 1):
            name = ("model/identity_params" if self.stp_shared_params
                    else f"model/identity_params_{i}")
            theta = self.linear(name, feat) + identity
            theta = theta.reshape(b, 2, 3)
            grid = st_grid(theta, prev_image.shape[2], prev_image.shape[3])
            transformed.append(st_sampler(prev_image, grid))
        return transformed, enc7

    def head(self, encs, hiddens, prev_image):
        fn = {"CDNA": self.cdna_head, "DNA": self.dna_head,
              "STP": self.stp_head}[self.model_type]
        return fn(encs, hiddens, prev_image)

    # -- composite + rollout ------------------------------------------------

    def composite(self, prev_image, transformed, enc6):
        """Masks + composite (train_model.py:717-728). In literal mode the
        softmax runs over reshape(-1, M+1) of the NCHW tensor — the
        Chainer port's pixel-scrambling reshape; intent mode softmaxes
        per pixel over the mask channel."""
        b, _, h, w = prev_image.shape
        m1 = self.num_masks + 1
        masks = torch.relu(self.deconv("masks", enc6, stride=1))
        if self.literal_quirks:
            masks = torch.softmax(masks.reshape(-1, m1), dim=1)
            masks = masks.reshape(b, m1, h, w)
        else:
            masks = torch.softmax(masks, dim=1)
        out = prev_image * masks[:, 0:1]
        # zip truncation: only the first num_masks candidates are used
        # (train_model.py:726-727).
        for i, layer in enumerate(transformed[:self.num_masks]):
            out = out + layer * masks[:, i + 1:i + 2]
        return out

    def _build_rollout(self, images, actions, states,
                       sampling: str = "feedself"):
        """Build the rollout graph + loss, train_model.py:620-764.

        sampling:
          * "feedself": generated frames fed back ATTACHED (the
            eval/feedself path at train_model.py:664-666; under training
            this backprops through the whole autoregressive chain).
          * "detach": generated frames fed back DETACHED — the reference's
            scheduled_sample CPU round-trip side effect
            (train_model.py:89-122, chainer.cuda.to_cpu of .data) with
            num_ground_truth=0, i.e. every post-context step feeds the
            detached generated frame.
        """
        images = torch.as_tensor(np.asarray(images), dtype=self.dtype)
        actions = torch.as_tensor(np.asarray(actions), dtype=self.dtype)
        states = torch.as_tensor(np.asarray(states), dtype=self.dtype)
        t_total = images.shape[0]
        ctx = self.context_frames

        lstm_states = [(None, None)] * 7
        current_state = states[0]
        gen_images, gen_states = [], []
        for t in range(t_total - 1):
            if t < ctx or not gen_images:
                prev_image = images[t]
            elif sampling == "detach":
                prev_image = gen_images[-1].detach()
            else:
                prev_image = gen_images[-1]
            state_action = torch.cat([actions[t], current_state], dim=1)
            lstm_states, encs, hiddens = self.forward_step(
                lstm_states, prev_image, state_action)
            transformed, _ = self.head(encs, hiddens, prev_image)
            gen_images.append(self.composite(prev_image, transformed,
                                             encs[6]))
            current_state = self.linear("current_state", state_action)
            gen_states.append(current_state)

        loss = torch.zeros((), dtype=self.dtype)
        psnr_all = torch.zeros((), dtype=self.dtype)
        recon, psnrs = [], []
        for x, gx in zip(images[ctx:], gen_images[ctx - 1:]):
            mse = ((x - gx) ** 2).mean()
            recon.append(mse)
            p = 10.0 * torch.log(1.0 / mse) / math.log(10.0)
            psnrs.append(p)
            psnr_all = psnr_all + p
            loss = loss + mse
        for st, gst in zip(states[ctx:], gen_states[ctx - 1:]):
            loss = loss + ((st - gst) ** 2).mean() * 1e-4
        loss = loss / float(t_total - ctx)
        return {
            "gen_images": gen_images,
            "gen_states": gen_states,
            "recon": recon,
            "psnrs_t": psnrs,
            "loss_t": loss,
            "psnr_all_t": psnr_all,
        }

    def rollout(self, images: np.ndarray, actions: np.ndarray,
                states: np.ndarray) -> Dict[str, np.ndarray]:
        """Feedself (eval-mode) rollout + loss, train_model.py:620-764.

        Args: images (T, B, C, H, W) float in [0,1]; actions/states
        (T, B, 5). Returns gen_images (T-1, B, C, H, W), per-frame
        recon/psnr, loss, psnr_all.
        """
        with torch.no_grad():
            g = self._build_rollout(images, actions, states, "feedself")
        return {
            "gen_images": torch.stack(g["gen_images"]).numpy(),
            "gen_states": torch.stack(g["gen_states"]).numpy(),
            "recon_costs": np.array([r.item() for r in g["recon"]]),
            "psnrs": np.array([p.item() for p in g["psnrs_t"]]),
            "loss": g["loss_t"].item(),
            "psnr_all": g["psnr_all_t"].item(),
        }

    def train_step(self, images: np.ndarray, actions: np.ndarray,
                   states: np.ndarray, sampling: str = "feedself",
                   lr: float = 1e-3, b1: float = 0.9, b2: float = 0.999,
                   eps: float = 1e-8) -> Dict[str, object]:
        """One reference training step: loss, per-parameter gradients and
        ONE Chainer-Adam update (train_model.py:860-861, 937-950;
        chainer.optimizers.Adam update rule at t=1:
        m=(1-b1)g, v=(1-b2)g^2, alpha_t=alpha*sqrt(1-b2)/(1-b1),
        p -= alpha_t*m/(sqrt(v)+eps)).

        Returns {"loss": float, "grads": {npz_key: ndarray},
        "new_params": {npz_key: ndarray}} in the Chainer npz layout.
        """
        for v in self.p.values():
            v.requires_grad_(True)
            if v.grad is not None:
                v.grad = None
        g = self._build_rollout(images, actions, states, sampling)
        g["loss_t"].backward()

        grads, new_params = {}, {}
        t = 1
        alpha_t = lr * math.sqrt(1.0 - b2 ** t) / (1.0 - b1 ** t)
        with torch.no_grad():
            for k, v in self.p.items():
                gk = v.grad if v.grad is not None else torch.zeros_like(v)
                grads[k] = gk.detach().numpy().copy()
                m = (1.0 - b1) * gk
                vv = (1.0 - b2) * gk * gk
                new_params[k] = (
                    v - alpha_t * m / (vv.sqrt() + eps)).numpy().copy()
        for v in self.p.values():
            v.requires_grad_(False)
            v.grad = None
        return {"loss": g["loss_t"].item(), "grads": grads,
                "new_params": new_params}


# -- chainer spatial transformer semantics ---------------------------------

def st_grid(theta: torch.Tensor, h: int, w: int) -> torch.Tensor:
    """F.spatial_transformer_grid: align-corners target grid in [-1, 1],
    source = theta @ (x, y, 1); returns (B, 2, H, W) with channel 0 = x."""
    ys, xs = torch.meshgrid(
        torch.linspace(-1.0, 1.0, h, dtype=theta.dtype),
        torch.linspace(-1.0, 1.0, w, dtype=theta.dtype), indexing="ij")
    coords = torch.stack(
        [xs, ys, torch.ones_like(xs)], dim=0).reshape(3, -1)   # (3, H*W)
    grid = theta @ coords                                       # (B, 2, HW)
    return grid.reshape(-1, 2, h, w)


def st_sampler(x: torch.Tensor, grid: torch.Tensor) -> torch.Tensor:
    """F.spatial_transformer_sampler: bilinear sampling of a one-pixel
    zero-padded image with coordinates rescaled to [0, size-1] (align
    corners) then clipped to the padded range — i.e. zero padding outside
    the frame."""
    b, c, h, w = x.shape
    u = grid[:, 0].reshape(b, -1)
    v = grid[:, 1].reshape(b, -1)
    xpad = Ft.pad(x, (1, 1, 1, 1))                 # (B, C, H+2, W+2)
    u = (u + 1.0) * (w - 1) / 2.0 + 1.0
    v = (v + 1.0) * (h - 1) / 2.0 + 1.0
    u = u.clamp(0.0, float(w + 1))
    v = v.clamp(0.0, float(h + 1))
    u0 = u.floor().clamp(0.0, float(w))
    v0 = v.floor().clamp(0.0, float(h))
    u1 = u0 + 1.0
    v1 = v0 + 1.0
    w00 = (u1 - u) * (v1 - v)
    w01 = (u - u0) * (v1 - v)
    w10 = (u1 - u) * (v - v0)
    w11 = (u - u0) * (v - v0)

    wp = w + 2
    flat = xpad.reshape(b, c, -1)

    def take(vi, ui):
        idx = (vi * wp + ui).long()                       # (B, P)
        return torch.gather(
            flat, 2, idx[:, None, :].expand(b, c, idx.shape[1]))

    out = (w00[:, None] * take(v0, u0) + w01[:, None] * take(v0, u1)
           + w10[:, None] * take(v1, u0) + w11[:, None] * take(v1, u1))
    return out.reshape(b, c, h, w)
