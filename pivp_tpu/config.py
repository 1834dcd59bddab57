"""Configuration for the TPU-native physical-interaction
video-prediction framework.

Mirrors the capability surface of the reference Chainer implementation
(`/root/reference/src/models/train_model.py:772-791` CLI flags and
`Model.__init__` at train_model.py:484) while being designed for JAX/XLA:
everything here is static, hashable metadata that parameterizes traced
programs (no data-dependent control flow leaks into jit).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple, Union

import jax.numpy as jnp

# Lower bound used when normalizing predicted kernels
# (reference: train_model.py:42).
RELU_SHIFT = 1e-12

# Kernel size for the DNA and CDNA transformation heads
# (reference: train_model.py:45).
DNA_KERN_SIZE = 5

# The reference-quirk switches that, together, reproduce the Chainer
# implementation's LITERAL runtime semantics (each is individually
# documented on ModelConfig below). Applied by `as_reference_literal` /
# the CLIs' --reference_literal flag; the parity oracle gates both this
# mode and the default original-TF-intent mode
# (tests/test_reference_parity*.py).
REFERENCE_LITERAL_OVERRIDES = dict(
    stp_shared_params=True,
    detach_sampled=True,
    chainer_mask_scramble=True,
    dna_border_zero=True,
)


def as_reference_literal(cfg: "ModelConfig") -> "ModelConfig":
    """Return `cfg` with every reference-quirk switch set to the Chainer
    implementation's literal behavior — use when importing a
    reference-trained checkpoint whose outputs must be reproduced
    bit-for-bit (mask-softmax scramble, DNA border zeroing, detached
    scheduled sampling, shared STP params)."""
    return dataclasses.replace(cfg, **REFERENCE_LITERAL_OVERRIDES)


def tpu_backend() -> bool:
    """True when the default JAX backend is a TPU (including plugin
    backends like `axon` that tunnel to one). Used to resolve the 'auto'
    settings: bf16 compute and the Pallas kernels are on by default on
    TPU and off elsewhere (XLA fallback paths)."""
    try:
        import jax

        platform = jax.devices()[0].platform.lower()
    except Exception:
        return False
    return platform not in ("cpu", "gpu", "cuda", "rocm")


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Static architecture + rollout configuration.

    Field provenance (reference train_model.py unless noted):
      * model_type / num_masks / use_state / scheduled_sampling_k /
        context_frames: Model.__init__ kwargs (484-548).
      * sequence_length / image size / state dims: CLI defaults (779-787)
        and the robot-push data contract (make_dataset.py:17-25).
    """

    model_type: str = "CDNA"  # one of CDNA | DNA | STP
    num_masks: int = 10
    use_state: bool = True
    # k parameter for inverse-sigmoid scheduled sampling; -1 disables it and
    # the model always feeds back its own predictions after the context
    # frames (train_model.py:649-657).
    scheduled_sampling_k: float = 900.0
    context_frames: int = 2
    sequence_length: int = 10

    image_height: int = 64
    image_width: int = 64
    color_channels: int = 3
    action_dim: int = 5
    state_dim: int = 5

    dna_kern_size: int = DNA_KERN_SIZE
    relu_shift: float = RELU_SHIFT

    # ConvLSTM forget-gate bias added pre-sigmoid (train_model.py:234).
    forget_bias: float = 1.0
    # LayerNorm epsilon (chainer L.LayerNormalization default).
    layer_norm_eps: float = 1e-6

    # --- reference-quirk compatibility switches -------------------------
    # The reference STP head reuses ONE Linear(6) for every mask, so all
    # masks receive identical affine params per step (train_model.py:465-467);
    # the original TF code used distinct params per mask. True reproduces the
    # reference quirk; False gives each mask its own projection.
    #
    # DELIBERATE ASYMMETRY vs the other three quirk switches (which
    # default to intent/False): this one defaults to the QUIRK. Reasons:
    # (a) checkpoint shape compatibility — a reference-trained STP npz has
    # one model/identity_params tensor, and flipping the default would
    # make `pivp-convert` imports fail out of the box; (b) performance —
    # shared params let ONE warp be computed and broadcast (exact by
    # construction), vs num_masks-1 distinct warps (measured cost of the
    # per-mask branch: tools/bench_matrix.py --stp_per_mask; see the
    # BENCHMARKS.md variant matrix).
    # The per-mask branch is fully supported and oracle-gated (forward +
    # gradients, tests/test_reference_parity*.py); opt in with
    # stp_shared_params=False / --stp_shared_params 0.
    stp_shared_params: bool = True
    # The reference scheduled_sample round-trips through CPU numpy and thus
    # detaches gradients for sampled frames (train_model.py:89-122). True
    # reproduces that with stop_gradient; False (default) keeps the mixing
    # differentiable, which is strictly better for training.
    detach_sampled: bool = False
    # The Chainer port softmaxes the compositing masks over reshape(-1,
    # num_masks+1) of the NCHW tensor, scrambling pixels across mask
    # channels (train_model.py:720-722) — a port bug vs the original TF's
    # per-pixel softmax. True reproduces the scramble bit-exactly, for
    # output parity against reference-trained checkpoints.
    chainer_mask_scramble: bool = False
    # The Chainer port's DNA head slices padded[k:size] instead of
    # padded[k:k+size] and re-pads the bottom/right with zeros
    # (train_model.py:395-405), dropping up to K-1 rows/cols of real
    # content. True reproduces that; False (default) uses the true
    # cross-correlation windows (the original TF behavior).
    dna_border_zero: bool = False

    # Compute dtype for convolutions / matmuls. Params are always stored in
    # float32; bfloat16 compute keeps the MXU at full throughput.
    compute_dtype: str = "float32"

    # Precision of the ConvLSTM gate nonlinearities: 'float32'
    # (reference-exact numerics, the default) or 'compute' (gate math in
    # the compute dtype). Under bf16 compute the cell carry is
    # re-quantized to bf16 every step regardless — the conv consumes it
    # in compute dtype — so 'compute' mainly halves the HBM traffic of
    # the gate elementwise fusions; measure before enabling.
    lstm_gate_compute: str = "float32"

    # Collapse the masked CDNA mixture into one per-pixel kernel and fuse
    # the composite (see transforms.fused_cdna_composite) — algebraically
    # identical to the unfused path, avoids materializing the
    # (B, M, H, W, C) transformed stack. Disable to run the literal
    # candidate-stack formulation.
    fused_cdna: bool = True
    # Evaluate the compositing-mask deconv and the head's enc7 deconv —
    # two 1x1 stride-1 convs on the SAME enc6 input (train_model.py:527
    # and :288/:364/:429) — as ONE conv with concatenated output
    # channels, then split. Algebraically exact per output channel (the
    # channel axis is the GEMM N dim; each column's dot product is
    # unchanged). Measured on v5e (tools/bench_conv_channels.py): a
    # cout=3 64x64 1x1 conv costs 155 us fwd+bwd vs 191 us at cout=32 —
    # these small-N convs are latency-bound, so the merge saves ~one
    # conv's worth per timestep (~1.4 ms/step at the bench config).
    merge_output_convs: bool = True
    # Use the Pallas local-kernel-apply op for the K*K tap application in
    # the fused CDNA / DNA paths (TPU only; falls back to XLA otherwise).
    use_pallas: bool = False
    # Run the Pallas kernels in interpret mode (pure-JAX emulation): lets
    # CPU test meshes execute the EXACT program shape the TPU default
    # compiles — including the GSPMD batch-partitioning rules of the
    # custom calls. Tests/tools only (set via TrainConfig.model_overrides).
    pallas_interpret: bool = False
    # Fused ConvLSTM gate update as one Pallas VMEM pass (TPU only):
    # f32 gate math at storage-dtype I/O traffic, superseding the
    # lstm_gate_compute precision/traffic trade-off.
    use_pallas_gates: bool = False

    # MXU input-channel padding for the ConvLSTM gate convs (FORWARD
    # only, via custom_vjp; backward runs the standard unpadded conv
    # grads). The v5e conv lowering contracts input channels per kernel
    # position, so a gate conv with cin < 128 starves the MXU K tile:
    # measured per-shape (tools/conv_shape_attribution.py, b32 bench
    # config) the cin=64 lstm1/2 gate convs run at 42% MFU and the
    # cin=96 lstm3 conv at 48%, while the SAME conv at cin=128/192 hits
    # 89-96%. Zero-padding cin to 128 is algebraically exact (zero
    # channels contribute nothing) and applies only where cin < 128.
    # Backward stays unpadded because a padded weight-gradient conv
    # DOUBLES its FLOPs for rows that are discarded. The win is
    # batch-dependent (tools/bench_conv_opts.py, real v5e): -3.4% at
    # the reference b32 config (37.85 -> 36.57 ms/step), but +8% at b64
    # and +5.6% at b128, where the conv's GEMM M dim is already wide
    # enough that doubling K buys no rate. "auto" (default) pads only
    # when the traced batch is <= 48; True/False force it.
    pad_gate_convs: Union[bool, str] = "auto"
    # Lower the 1x1 stride-1 convs (enc3 after the smear concat, the
    # compositing-mask/enc7 output conv) through the XLA dot path as
    # explicit (B*H*W, Cin) x (Cin, Cout) matmuls instead of the
    # convolution tiler. Identical contraction; per-shape attribution
    # showed the conv lowering at 0.8-6% MFU on these shapes with a
    # batch-dependent cliff at b64 (BENCHMARKS.md round-5 note).
    # True = dot fwd+bwd (measured +4.7% at b32: the reshape breaks the
    # LN/relu producer fusion); "bwd" = conv forward, dot backward
    # (layers._conv1x1_hybrid — targets only the 75 us/op
    # backward-to-input pathology).
    one_by_one_matmul: Union[bool, str] = False
    # Evaluate enc0 (5x5 stride-2 conv on the 3-channel image,
    # train_model.py:500) as a space-to-depth 3x3 stride-1 conv on a
    # (H/2, W/2, 12)-packed input — the classic TPU stem-conv transform.
    # Algebraically exact (same multiply-add set; the rearranged kernel
    # zero-fills the 33 unused taps): every output position reads the
    # same input pixels with the same weights. The win is the BACKWARD
    # path: the reference layout's backward-to-input conv produces N=3
    # output channels through a lhs_dilated window (measured 4.5% MFU,
    # 70 us/op); in s2d coords it is a stride-1 3x3 conv producing N=12
    # plus a free depth-to-space reshape. Default set by measurement
    # (BENCHMARKS.md round-5 note).
    enc0_space_to_depth: bool = False

    # State-cost weight (train_model.py:751).
    state_cost_weight: float = 1e-4

    # Unroll factor for the time scan (lax.scan unroll=): >1 trades
    # compile time for less loop overhead and cross-step fusion.
    scan_unroll: int = 1

    # Trunk channel plan (train_model.py:500-515).
    enc_channels: Tuple[int, ...] = (32, 32, 64, 64, 128, 96, 64)
    lstm_channels: Tuple[int, ...] = (32, 32, 64, 64, 128, 64, 32)

    def __post_init__(self):
        if self.model_type not in ("CDNA", "DNA", "STP"):
            raise ValueError(f"No network specified: {self.model_type!r}")
        if self.model_type == "DNA" and self.num_masks != 1:
            # reference: train_model.py:389-390
            raise ValueError("Only one mask is supported for DNA model.")
        if self.compute_dtype not in ("float32", "bfloat16", "float16",
                                      "float64"):
            # float64 is the numerics-debug path (requires
            # jax_enable_x64; used by the training-parity gate).
            raise ValueError(
                f"compute_dtype must be float32/bfloat16/float16/float64, "
                f"got {self.compute_dtype!r}")
        if self.lstm_gate_compute not in ("float32", "compute"):
            raise ValueError(
                f"lstm_gate_compute must be float32/compute, got "
                f"{self.lstm_gate_compute!r}")
        if self.context_frames < 1:
            raise ValueError("context_frames must be >= 1")
        if self.pad_gate_convs not in (True, False, "auto"):
            raise ValueError(
                f"pad_gate_convs must be True/False/'auto', got "
                f"{self.pad_gate_convs!r}")
        if self.one_by_one_matmul not in (True, False, "bwd"):
            raise ValueError(
                f"one_by_one_matmul must be True/False/'bwd', got "
                f"{self.one_by_one_matmul!r}")
        if self.sequence_length <= self.context_frames:
            raise ValueError("sequence_length must exceed context_frames")

    @property
    def dtype(self) -> jnp.dtype:
        return jnp.dtype(self.compute_dtype)

    @property
    def is_cdna(self) -> bool:
        return self.model_type == "CDNA"

    @property
    def is_dna(self) -> bool:
        return self.model_type == "DNA"

    @property
    def is_stp(self) -> bool:
        return self.model_type == "STP"


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-loop configuration mirroring the 19 reference CLI flags
    (train_model.py:772-791)."""

    data_dir: str = "data/processed/brain-robotics-data/push/push_train"
    output_dir: str = "models"
    event_log_dir: str = "models"
    num_iterations: int = 100000
    pretrained_model: str = ""
    pretrained_state: str = ""
    sequence_length: int = 10
    context_frames: int = 2
    use_state: bool = True
    model_type: str = "CDNA"
    num_masks: int = 10
    schedsamp_k: float = 900.0
    train_val_split: float = 0.95
    batch_size: int = 32
    learning_rate: float = 1e-3
    validation_interval: int = 200
    save_interval: int = 50
    debug: bool = False

    # --- TPU-native additions (no reference equivalent) -----------------
    seed: int = 0
    image_height: int = 64
    image_width: int = 64
    # 'auto' resolves to bfloat16 on TPU backends (MXU-native, ~2x conv
    # throughput) and float32 elsewhere; pass 'float32' explicitly for
    # reference-exact training numerics.
    compute_dtype: str = "auto"
    # ConvLSTM gate-math precision: 'auto' = compute dtype whenever
    # compute resolves to bf16 (measured -8.6% step time, losses agree
    # to 3 sig figs — the carry is bf16-requantized per step either
    # way), 'float32' for reference-exact gate numerics.
    lstm_gate_compute: str = "auto"
    # Number of data-parallel shards; 0 = use all visible devices.
    num_devices: int = 0
    # Spatial (height) model-parallel ways: shard the image height axis
    # over the mesh's `model` axis in ADDITION to data parallelism —
    # GSPMD inserts the conv halo exchanges over ICI. 1 = off. Total
    # devices used = data_ways * spatial_parallel; needs
    # (image_height//8)/spatial_parallel >= 4 (see
    # parallel/train_step._spatial_guard). Single-controller only.
    spatial_parallel: int = 1
    # jax.checkpoint (remat) the per-timestep cell inside the scan to trade
    # FLOPs for HBM on long rollouts.
    remat: bool = False
    # Pallas local-kernel-apply for the CDNA/DNA tap application.
    # -1 = auto (on for TPU backends, off elsewhere), 0 = off, 1 = on.
    use_pallas: int = -1
    # Fused CDNA+composite evaluation (see ModelConfig.fused_cdna).
    fused_cdna: bool = True
    # One merged masks+enc7 output conv (see ModelConfig.merge_output_convs).
    merge_output_convs: bool = True
    # Forward-only gate-conv input-channel padding
    # (ModelConfig.pad_gate_convs): 'auto' / True / False, or the CLI's
    # '0'/'1' strings.
    pad_gate_convs: Union[bool, str] = "auto"
    # Optimizer steps executed per device dispatch (amortizes host/tunnel
    # latency; per-iteration metrics are still recorded, and epoch
    # bookkeeping splits metric arrays at the exact step). 0 = auto:
    # 25 on TPU backends (clamped to epoch/run length — without this a
    # remote-attached TPU pays ~50 ms RTT per ~40 ms step, halving
    # out-of-box throughput), 1 elsewhere. 1 = reference behavior of one
    # dispatch per iteration.
    steps_per_call: int = 0
    # Time-scan unroll: 0 = auto (FULL unroll on TPU — measured 81 -> 44
    # ms/step at the bench config because the scan's residual stacking
    # disappears; 1 elsewhere, where compile time dominates). Any other
    # value is passed to lax.scan verbatim.
    scan_unroll: int = 0
    # Read sequences from disk per batch (mmap-backed lazy gather)
    # instead of materializing the whole dataset in RAM up front (the
    # reference behavior, train_model.py:813-834). Use for datasets that
    # exceed host memory; peak host usage becomes ~one batch.
    lazy_load: bool = False
    # Gradient accumulation: split each batch into N microbatches and
    # average their gradients (exact for the mean loss) — peak activation
    # HBM scales with batch/N, enabling large effective batches or high
    # resolutions on one chip. batch_size must be divisible by N.
    grad_accum: int = 1
    # Input-pipeline prefetch depth: a daemon thread assembles (and, with
    # u8_transfer, quantizes) up to N device calls ahead so host-side
    # batch assembly overlaps device compute. 0 disables (assembly on the
    # consumer thread, still fully deterministic — the batch order is
    # identical either way).
    prefetch: int = 2
    # Abort + save an emergency checkpoint if the loss goes non-finite.
    nan_guard: bool = True
    # Catch SIGTERM/SIGINT (TPU-VM maintenance events, spot reclaims),
    # checkpoint at the next dispatch boundary, and exit cleanly so an
    # orbax run auto-resumes from the exact optimizer step on relaunch.
    # Handler installation is main-thread-only (no-op elsewhere); see
    # training/preemption.py.
    graceful_preemption: bool = True
    # Checkpoint backend: 'npz' keeps the reference artifact contract
    # (train_model.py:1023-1041); 'orbax' additionally writes step-managed
    # atomic Orbax checkpoints of the full TrainState and auto-resumes
    # from the latest one when the run directory already has any.
    checkpointer: str = "npz"
    # Ship image batches to the device as uint8 and dequantize on-device
    # (4x less host->device traffic; lossless for the uint8-sourced
    # robot-push frames, <=1/510 quantization for other sources).
    u8_transfer: bool = True
    # Train with the reference's LITERAL runtime semantics (all the
    # ModelConfig reference-quirk switches at once: detached scheduled
    # sampling, Chainer mask-softmax scramble, DNA border zeroing, shared
    # STP params — see REFERENCE_LITERAL_OVERRIDES). Default False =
    # original-TF-intent semantics. For bit-closest numerics also pass
    # compute_dtype='float32' (literal mode only changes the MATH, not
    # the precision knobs).
    reference_literal: bool = False
    # Advanced hook (tools/tests): extra ModelConfig field overrides
    # applied LAST in model_config() — e.g. a single quirk flag for an
    # ablation (tools/semantics_study.py). Tuple-of-pairs keeps the
    # dataclass hashable; not exposed on any CLI.
    model_overrides: Tuple[Tuple[str, object], ...] = ()

    def model_config(self) -> ModelConfig:
        dtype = self.compute_dtype
        if dtype == "auto":
            dtype = "bfloat16" if tpu_backend() else "float32"
        gate = self.lstm_gate_compute
        if gate == "auto":
            gate = "compute" if dtype == "bfloat16" else "float32"
        pallas = self.use_pallas
        if pallas < 0:        # -1 = auto (True/False/0/1 pass through)
            pallas = tpu_backend()
        unroll = self.scan_unroll
        if unroll == 0:       # auto
            unroll = (self.sequence_length - 1) if tpu_backend() else 1
        quirks = (REFERENCE_LITERAL_OVERRIDES if self.reference_literal
                  else {})
        mc = ModelConfig(
            model_type=self.model_type,
            num_masks=self.num_masks,
            use_state=self.use_state,
            scheduled_sampling_k=self.schedsamp_k,
            context_frames=self.context_frames,
            sequence_length=self.sequence_length,
            image_height=self.image_height,
            image_width=self.image_width,
            compute_dtype=dtype,
            lstm_gate_compute=gate,
            use_pallas=bool(pallas),
            # NOT auto-enabled: the fused gate kernel measured SLOWER
            # than XLA's own gate fusions at the bench config (43.3 vs
            # 39.0 ms/step — 126 small kernel launches/step outweigh the
            # fusion win; see BENCHMARKS.md "Rejected: Pallas gate
            # kernel"). Kept for explicit experimentation.
            use_pallas_gates=False,
            fused_cdna=self.fused_cdna,
            merge_output_convs=self.merge_output_convs,
            pad_gate_convs={"0": False, "1": True}.get(
                str(self.pad_gate_convs), self.pad_gate_convs),
            scan_unroll=unroll,
            **quirks,
        )
        if self.model_overrides:
            mc = dataclasses.replace(mc, **dict(self.model_overrides))
        return mc
