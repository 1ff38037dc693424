"""Train config (reference parity: ``cellulus/configs/train_config.py:10-127``).

Extra, TPU-specific fields (``precision``, ``seed``, ``num_prefetch_workers``,
``data_parallelism``) have defaults chosen so reference TOML files work
verbatim.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional

from .dataset_config import DatasetConfig
from .utils import as_config


@dataclass
class TrainConfig:
    """Training hyper-parameters.

    Attributes:
        train_data_config: Dataset config for training data.
        train_data_configs: [tpu extension] Optional list of dataset configs
            for multi-dataset training; crops are drawn uniformly across
            datasets (all must share channel count and dimensionality).
        validate_data_config: Dataset config for validation data.
        crop_size: Spatial size of training crops (model input size).
        batch_size: Samples per optimization step (global batch across the
            device mesh).
        max_iterations: Number of optimization steps.
        initial_learning_rate: Adam learning rate.
        density: Fraction of pixels sampled as anchors per crop.
        kappa: Neighborhood radius for reference-pixel sampling.
        temperature: Gaussian damping factor of the OCE loss.
        regularizer_weight: Weight of the L2 regularizer on embeddings.
        save_model_every / save_best_model_every / save_snapshot_every:
            Checkpoint / best-tracking / snapshot cadences.
        num_workers: Host-side data-pipeline worker threads.
        elastic_deform: Enable elastic augmentation.
        control_point_spacing: Pixel spacing of elastic control points.
        control_point_jitter: Stddev of control-point jitter.
        device: Accepted for reference compat; JAX picks the platform.
        precision: "float32" or "bfloat16" compute for the model.
        seed: Base RNG seed for init + sampling.
        data_parallelism: Number of mesh data shards; ``None`` = all local
            devices.
        device_pair_sampling: Sample anchor/reference pairs on device inside
            the jitted step (same distribution as the host sampler, but no
            per-step coordinate transfer). Disable for bit-exact parity with
            the host sampling path.
        loss_mode: "pairs" (reference-parity sampled pixel pairs; default),
            "grid" (stratified anchors on a jittered grid — the anchor
            gather and its transpose scatter disappear into a strided
            slice; validated to train to identical quality, F1 1.000 in
            2D, with lower anchor-sampling variance. Measured correctly
            the step time matches pairs at 64 fmaps — weight-gradient
            convs dominate both; see NOTES.md),
            or "dense" (EXPERIMENTAL gather-free
            shifted-field estimator: same expectation but offsets shared
            across anchors make gradients ~10x noisier — observed to stall
            training; kept for research, train() warns loudly).
        steps_per_dispatch: [tpu extension] Steps fused into one device
            dispatch via ``lax.scan`` (amortizes per-dispatch host latency).
            With K > 1, checkpoints/snapshots land on the chunk boundary at
            or after their configured iteration; loss logging stays
            per-iteration and exact. 1 (default) = reference-exact cadence.
        transfer_precision: [tpu extension] "float32" ships normalized crops;
            "native" ships crops in the source dtype (e.g. uint8) and
            normalizes on device — 4x less host->device traffic for uint8
            data with bit-identical results. Requires elastic_deform=False
            (deformation interpolates to float on the host anyway).
        elastic_on_device: [tpu extension] Run elastic augmentation INSIDE
            the jitted train step (same parameter model as the host path;
            RNG streams differ, so results are distribution- not bit-equal).
            Frees the single-threaded host warp from the data workers and
            composes with transfer_precision="native" (padded crops ship in
            the source dtype; the warp + normalization happen on device).
            Requires a key-driven loss mode (device_pair_sampling or
            loss_mode "grid"/"dense").
        lr_milestones: [paper recipe] Iterations at which the learning rate
            multiplies by ``lr_decay_factor``. The PAPER trains with
            LR / 10 at epochs 20 and 30 (Appendix A) but the reference CODE
            keeps Adam's LR constant — default None preserves code parity;
            set e.g. ``[62500, 93750]`` to reproduce the paper schedule at
            batch 8 on a 25k-sample epoch.
        lr_decay_factor: Multiplier applied at each milestone (paper: 0.1).
        grad_clip_norm: [tpu extension] Clip the gradient's global norm to
            this value before the optimizer update (torch
            ``clip_grad_norm_`` ordering: clip, then L2 decay + Adam). The
            OCE objective can diverge at aggressive learning rates (the
            embedding-magnitude regularizer explodes while the bounded OCE
            term saturates); default ``None`` never clips, matching the
            reference.
        log_grad_norm: [tpu extension] Record the raw (pre-clip) gradient
            global norm as a ``grad_norm`` column in ``loss.csv`` — the
            signal that catches OCE divergence immediately, and the
            measured basis for choosing ``grad_clip_norm``. Off by
            default: the recorder adds an optimizer-state leaf, so
            toggling it across a resume resets Adam moments (warned).
            With ``steps_per_dispatch`` > 1 only each chunk's last step
            is observable; other rows log NaN.
        remat: [tpu extension] Rematerialize conv-pass activations in the
            backward pass (``jax.checkpoint``): peak activation memory
            drops to one pass's inputs at the cost of re-running forward
            convs during backward — for large-volume (3D) or large-batch
            crops that otherwise exceed HBM. Gradients identical (tested).
            Effective on the TPU backend (recompute verified present in
            the compiled HLO); XLA's CPU pipeline CSEs the recompute away,
            so it is a no-op on CPU.
        pallas_dw: [tpu extension, EXPERIMENTAL — measured at-par/slower on
            the tunneled v5e] Compute 2D 3x3 conv filter gradients in a
            Pallas kernel that packs all 9 taps into one (3Ci x 3Co) VMEM
            dot (ops/pallas_dw.py). Measured: 64ch LOSES to XLA (3.9 vs
            2.2 ms — VPU relayout cost), 192ch ties; see the NOTES.md
            round-3 roofline post-mortem. Kept for wider-channel models
            and non-tunneled parts. Numerics: bf16 operands, f32
            accumulation, parity-tested (tests/test_pallas_dw.py).
        packed_dw: [tpu extension, EXPERIMENTAL — measured slower on v5e]
            Compute conv filter gradients as packed matmuls
            (ops/conv_vjp.py) instead of XLA's conv-backprop-filter.
            Numerically equivalent (f32 accumulation both ways), but the
            shift/pad stacking materializes in HBM: full grid-mode step
            59.9 ms vs 37.1 ms native on v5e (scripts/diag_step_dw.py);
            isolated dw matmuls are a wash (scripts/diag_dw.py). Kept as a
            measured negative result; default off.
        stop_file: [tpu extension] Graceful-preemption sentinel: touching
            this file (path relative to the run's working directory, next
            to ``models/``) makes the loop checkpoint the in-hand state
            under its true iteration and return cleanly — the safe way to
            end a device-holding run without killing the process
            mid-dispatch. Only a file touched AFTER the run started
            counts: a pre-existing file with this name (or a stale
            sentinel from a previous stop) is ignored with a warning,
            never deleted. Under multi-process training the primary's
            verdict is broadcast at the ``save_best_model_every`` cadence
            so every process exits the same step. ``None`` disables the
            check.
        pair_count_mode: [tpu extension] "reference" replicates the
            reference's anchor-count formula, which uses only the first two
            spatial dims even in 3D (reference ``zarr_dataset.py:244-245``) —
            starving 3D crops of pairs; "all_dims" scales anchor count with
            the full unbiased volume and reference count with the kappa-ball
            volume.
    """

    train_data_config: Optional[DatasetConfig] = None
    train_data_configs: Optional[List[DatasetConfig]] = None
    validate_data_config: Optional[DatasetConfig] = None
    crop_size: List[int] = field(default_factory=lambda: [252, 252])
    batch_size: int = 8
    max_iterations: int = 100_000
    initial_learning_rate: float = 4e-5
    lr_milestones: Optional[List[int]] = None
    lr_decay_factor: float = 0.1
    grad_clip_norm: Optional[float] = None
    log_grad_norm: bool = False
    density: float = 0.1
    kappa: float = 10.0
    temperature: float = 10.0
    regularizer_weight: float = 1e-5
    save_model_every: int = 1_000
    save_best_model_every: int = 100
    save_snapshot_every: int = 1_000
    num_workers: int = 8
    elastic_deform: bool = True
    control_point_spacing: int = 64
    control_point_jitter: float = 2.0
    device: str = "cuda:0"
    precision: str = "float32"
    seed: int = 0
    data_parallelism: Optional[int] = None
    device_pair_sampling: bool = True
    loss_mode: str = "pairs"
    steps_per_dispatch: int = 1
    transfer_precision: str = "float32"
    pair_count_mode: str = "reference"
    elastic_on_device: bool = False
    packed_dw: bool = False
    pallas_dw: bool = False
    remat: bool = False
    stop_file: Optional[str] = "STOP"

    def __post_init__(self) -> None:
        self.train_data_config = as_config(DatasetConfig, self.train_data_config)
        if self.train_data_configs is not None:
            self.train_data_configs = [
                as_config(DatasetConfig, c) for c in self.train_data_configs
            ]
        self.validate_data_config = as_config(DatasetConfig, self.validate_data_config)
        self.crop_size = list(self.crop_size)
        self.initial_learning_rate = float(self.initial_learning_rate)
        self.density = float(self.density)
        self.kappa = float(self.kappa)
        self.temperature = float(self.temperature)
        self.regularizer_weight = float(self.regularizer_weight)
        self.lr_decay_factor = float(self.lr_decay_factor)
        if self.lr_milestones is not None:
            self.lr_milestones = [int(m) for m in self.lr_milestones]
        if self.grad_clip_norm is not None:
            self.grad_clip_norm = float(self.grad_clip_norm)
            if self.grad_clip_norm <= 0:
                raise ValueError("grad_clip_norm must be > 0")
        self.control_point_jitter = float(self.control_point_jitter)
        if self.precision not in ("float32", "bfloat16"):
            raise ValueError("precision must be 'float32' or 'bfloat16'")
        if self.loss_mode not in ("pairs", "grid", "dense"):
            raise ValueError("loss_mode must be 'pairs', 'grid' or 'dense'")
        self.steps_per_dispatch = int(self.steps_per_dispatch)
        if self.steps_per_dispatch < 1:
            raise ValueError("steps_per_dispatch must be >= 1")
        if self.transfer_precision not in ("float32", "native"):
            raise ValueError("transfer_precision must be 'float32' or 'native'")
        if self.pair_count_mode not in ("reference", "all_dims"):
            raise ValueError("pair_count_mode must be 'reference' or 'all_dims'")
        if self.pallas_dw and self.packed_dw:
            raise ValueError(
                "pallas_dw and packed_dw are mutually exclusive "
                "filter-gradient paths; enable at most one"
            )
