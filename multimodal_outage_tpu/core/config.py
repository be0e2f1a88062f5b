"""Typed configuration tree.

Every hardcoded constant scattered through the reference (paths at
reference lit.py:16, model hyperparams at models/unet.py:31-38 and
models/graph_wavenet.py:34-56, normalization stats at utils.py:31-32)
is centralized here as dataclasses with CLI overrides.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import Optional, Tuple

# Dataset normalization stats derived by the reference's find_mean_std.py
# (reference utils.py:31-32).
DEFAULT_NTL_MEAN = 3.201447427712248
DEFAULT_NTL_STD = 10.389727592468262

# NASA Black Marble fill-value sentinel zeroed on load (reference utils.py:60).
NTL_FILL_SENTINEL = 6.5535e03


@dataclass(frozen=True)
class DataConfig:
    data_dir: str = "data/synthetic"
    image_size: int = 128
    n_counties: int = 67
    channels: int = 1
    horizon: int = 7
    dataset_range: int = 30  # ± days around each hurricane (reference lit.py:160)
    mean: float = DEFAULT_NTL_MEAN
    std: float = DEFAULT_NTL_STD
    val_fraction: float = 0.3  # reference lit.py:161
    prefetch: int = 2  # device prefetch depth (double buffering)
    pipeline: str = "auto"  # auto|device|host input path selection
    # "auto" keeps the packed store HBM-resident (device-side window
    # gather, zero host bytes/step) when it fits this budget:
    device_store_budget_mb: int = 4096
    device_dtype: str = "bfloat16"  # HBM store/batch dtype (halves memory)
    # With a mesh: partition the HBM frame store's date dim over the data
    # axis (each chip holds D/dp frames) instead of replicating it — the
    # window gather becomes a sharded gather + all-reduce of the small
    # batch. Off by default: replication skips the collective entirely
    # and is right whenever the store comfortably fits one chip.
    shard_store: bool = False


@dataclass(frozen=True)
class GWNetConfig:
    """Graph WaveNet hyperparameters (reference models/graph_wavenet.py:101)."""

    residual_channels: int = 32
    dilation_channels: int = 32
    skip_channels: int = 256
    end_channels: int = 512
    kernel_size: int = 1  # reference default ⇒ receptive field 1
    blocks: int = 4
    layers: int = 2
    dropout: float = 0.3
    order: int = 2  # diffusion order (reference models/graph_wavenet.py:77)
    gcn_bool: bool = True  # False ⇒ no graph conv at all (reference :100,240)
    addaptadj: bool = True
    # randomadj=False seeds the adaptive-adjacency node embeddings with the
    # SVD factorization of the first static support instead of random init
    # (reference graph_wavenet.py:46,136-141 aptinit path):
    randomadj: bool = True
    node_embed_dim: int = 10  # adaptive-adjacency factor rank (reference :132-133)
    adjtype: str = "identity"  # reference's "doubletransition" degenerates to
    # identity (reference models/graph_wavenet.py:23-24); "doubletransition"
    # here gives the true [asym_adj(A), asym_adj(Aᵀ)] pair.
    # Fused gated-TCN + diffusion Pallas kernel. Default off: the honest
    # (fetch-synced) A/B measures XLA's batched einsums faster at this
    # model's sizes (BENCHMARKS.md); the kernel remains available and
    # tested for larger graphs/batches where fusion wins.
    use_pallas: bool = False
    # Reproduce the reference's raw .view() axis-scramble at the gwnet
    # boundary (models/graph_wavenet.py:189,255) for parity testing only:
    reference_view_quirk: bool = False


@dataclass(frozen=True)
class DCRNNConfig:
    """DCRNN hyperparameters honoring the reference kwargs interface
    (reference models/unet.py:16-27)."""

    max_diffusion_step: int = 2
    num_rnn_layers: int = 2
    rnn_units: int = 64
    # Support-set construction (reference kwargs interface,
    # models/unet.py:17): dual_random_walk → [D⁻¹A, D⁻¹Aᵀ],
    # random_walk → [D⁻¹A], identity → [I]
    filter_type: str = "dual_random_walk"
    # Scheduled sampling for the decoder (canonical DCRNN design):
    # with teacher_forcing > 0 the TRAIN step encodes the ground-truth
    # future frames into latent space (through the frozen-stat U-Net
    # contraction + bottleneck encoder) and each decoder step feeds that
    # latent target with this probability instead of its own output.
    # Eval/serving always self-feed.
    teacher_forcing: float = 0.0
    # Inverse-sigmoid decay of the probability over train steps
    # (p(step) = teacher_forcing · τ/(τ + e^{step/τ}), the canonical
    # DCRNN cl_decay_steps curriculum). 0 ⇒ constant probability.
    tf_decay_steps: int = 0


@dataclass(frozen=True)
class ModelConfig:
    st_gnn: str = "gwnet"
    input_channels: int = 1  # reference lit.py:23 passes 1
    output_channels: int = 1
    base_channels: int = 4  # U-Net stem width (reference models/unet.py:99)
    depth: int = 4  # number of Down/Up stages
    feature_vector_size: int = 256  # reference models/unet.py:35
    time_embed_size: int = 64  # reference models/unet.py:36
    compression_factor: int = 4  # reference models/unet.py:38
    encoder_dropout: float = 0.3  # reference models/unet.py:135
    train_date2vec: bool = False  # reference freezes a pretrained Date2Vec
    # .npz bundle from `pretrain-d2v` installed into the date2vec subtree
    # at model build (the reference's pretrained-checkpoint role):
    d2v_bundle: Optional[str] = None
    gwnet: GWNetConfig = field(default_factory=GWNetConfig)
    dcrnn: DCRNNConfig = field(default_factory=DCRNNConfig)
    compute_dtype: str = "bfloat16"  # conv/matmul compute dtype on TPU
    param_dtype: str = "float32"
    # Rematerialize U-Net conv blocks in the backward pass (jax.checkpoint):
    # trades extra conv FLOPs for O(depth) less activation HBM, raising
    # the largest trainable batch on a chip (b=16 OOMs a v5e without it):
    remat: bool = False
    # "all": every conv block; "stem": only the top-two-resolution blocks
    # (inc/down1/up3/up4), whose intra-block activations dominate HBM —
    # cheaper than all-block remat (−24% vs −42% at b=8) and the lever
    # for batches that OOM without it (BENCHMARKS.md r3 layout matrix);
    # "conv": every block under the save_only_these_names("conv_out")
    # policy — conv/convT outputs stay saved, only the BN/ReLU/pool/
    # concat tails recompute (models/unet.py):
    remat_scope: str = "all"
    # 2×2 max-pool lowering: "reduce_window" (flax nn.max_pool; measured
    # FASTEST e2e despite its select-and-scatter backward) or "pairwise"
    # (strided-slice maximums; measured 23% slower at b=8 — see
    # BENCHMARKS.md r3 layout matrix):
    pool: str = "reduce_window"
    # Single fused sweep for train-mode BatchNorm statistics (shifted
    # E[x²]−μ² with clamp) instead of the two-pass mean-then-variance.
    # Profiling showed the BN reduction chains cost ~19% of the b=8 v5e
    # train step; one sweep is worth +4.7% e2e throughput (BENCHMARKS.md)
    # at f32-rounding-level statistic differences (tested vs two-pass).
    # Set False (--bn_two_pass) for bit-closest torch arithmetic:
    bn_single_pass: bool = True

    def __post_init__(self):
        # argparse `choices` only guards the CLI; direct construction with
        # a typo'd scope would otherwise silently fall through the model's
        # string gates to stem-scope remat / reduce_window pooling
        if self.remat_scope not in ("all", "stem", "conv"):
            raise ValueError(
                f"remat_scope must be 'all', 'stem', or 'conv', got "
                f"{self.remat_scope!r}"
            )
        if self.pool not in ("reduce_window", "pairwise", "pallas"):
            raise ValueError(
                f"pool must be 'reduce_window', 'pairwise', or 'pallas', "
                f"got {self.pool!r}"
            )

    @property
    def st_gnn_in_dim(self) -> int:
        return self.feature_vector_size + self.time_embed_size


@dataclass(frozen=True)
class TrainConfig:
    epochs: int = 5  # reference lit.py:211
    batch_size: int = 16  # reference lit.py:213
    lr: float = 1e-3  # reference lit.py:60
    cosine_t_max: int = 10  # reference lit.py:61
    early_stop_patience: int = 10  # reference lit.py:181
    seed: int = 42  # reference lit.py:14
    log_every: int = 6  # reference lit.py:204
    checkpoint_dir: str = "logs"
    job_id: str = "test"
    keep_top_k: int = 1  # reference lit.py:194 save_top_k=1
    donate_buffers: bool = True
    # Split each batch into this many serially-scanned microbatches inside
    # ONE compiled step (train/steps.py:make_accum_train_step): peak
    # activation HBM drops to one microbatch's while gradients and the
    # serial-EMA BatchNorm running stats are EXACTLY the full batch's —
    # how the reference's default batch 16 (lit.py:213) trains on a chip
    # where b=16 does not fit in one shot (single-device path only).
    # 0 = auto: start one-shot and halve the microbatch on device OOM
    # (train/loop.py — any batch size trains without hand-tuning):
    grad_accum: int = 1
    # Scoped-VMEM fusion budget (KiB) passed as a jit compiler option on
    # TPU (train/steps.py:default_compiler_options): 49152 measured +1.0%
    # train throughput over the 16 MiB compiler default (BENCHMARKS.md
    # "XLA compiler-options sweep"). 0 = compiler default.
    xla_vmem_limit_kib: int = 49152
    resume: bool = False  # continue from the latest checkpoint in run dir
    # TensorBoard scalars alongside metrics.jsonl (SURVEY §5 "optional
    # TensorBoard scalars"; the reference's Lightning logger equivalent).
    # Requires tensorboardX or torch; degrades to JSONL-only if absent.
    tensorboard: bool = False
    debug_nans: bool = False  # jax_debug_nans numerical sanitizer (SURVEY §5)
    profile_dir: Optional[str] = None  # jax.profiler trace capture target
    profile_steps: int = 5  # steps to trace when profiling

    def __post_init__(self):
        if self.grad_accum < 0:
            raise ValueError(
                f"grad_accum must be >= 1, or 0 for auto; "
                f"got {self.grad_accum}"
            )


@dataclass(frozen=True)
class MeshConfig:
    """Device-mesh axes. data: batch DP; model: bottleneck-hidden TP;
    time: temporal-window sequence parallelism."""

    data: int = -1  # -1 ⇒ all remaining devices
    model: int = 1
    time: int = 1


@dataclass(frozen=True)
class Config:
    data: DataConfig = field(default_factory=DataConfig)
    model: ModelConfig = field(default_factory=ModelConfig)
    train: TrainConfig = field(default_factory=TrainConfig)
    mesh: MeshConfig = field(default_factory=MeshConfig)
    adjacency_csv: Optional[str] = None  # None ⇒ packaged Florida asset

    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)


def asdict(cfg) -> dict:
    return dataclasses.asdict(cfg)


def small_test_config(
    n_counties: int = 4,
    image_size: int = 16,
    horizon: int = 3,
    batch_size: int = 2,
) -> Config:
    """Tiny config for unit tests (parametrized 67→small-N per SURVEY §4)."""
    return Config(
        data=DataConfig(
            n_counties=n_counties, image_size=image_size, horizon=horizon
        ),
        model=ModelConfig(compute_dtype="float32"),
        train=TrainConfig(batch_size=batch_size, epochs=1),
        # single-device by default: the test env forces 8 virtual CPU
        # devices, and data=-1 would auto-SPMD every unit test; SPMD fit
        # is exercised explicitly in tests/test_fit_spmd.py
        mesh=MeshConfig(data=1),
    )
