"""Training configuration — names and defaults mirror the reference's
train_hyperparams.py (lines 1-37) so every reference recipe maps 1:1."""

from __future__ import annotations

from dataclasses import dataclass, field

KNOWLEDGE_DISTILLATION_MODE = ("Output_Only", "Intermediate")
LPIPS_IMAGE_SIZE = 256


@dataclass(frozen=True)
class TrainConfig:
    # model / data
    data_folder: str = ""
    generated_img_size: int = 256
    channel_multiplier: int = 2
    latent: int = 512
    n_mlp: int = 8
    ckpt: str | None = None
    load_train_state: bool = False

    # optimization (reference train_hyperparams.py:17-25)
    training_iters: int = 140001
    batch_size: int = 16
    init_lr: float = 0.002
    discriminator_r1: float = 10.0
    generator_path_reg_weight: float = 2.0
    path_reg_batch_shrink: int = 2
    g_reg_freq: int = 4
    d_reg_freq: int = 16
    noise_mixing: float = 0.9

    # validation / checkpointing (reference train_hyperparams.py:27-31)
    val_sample_num: int = 25
    val_sample_freq: int = 1000
    model_save_freq: int = 10000
    fid_n_sample: int = 50000
    fid_batch: int = 32

    # knowledge distillation (reference train_hyperparams.py:33-37)
    teacher: str | None = None
    kd_l1_lambda: float = 3.0
    kd_lpips_lambda: float = 3.0
    kd_mode: str = "Output_Only"
    content_aware_KD: bool = True

    # TPU-native extras
    seed: int = 0
    compute_dtype: str = "float32"    # 'bfloat16' for the fast path
    # storage dtype for Adam's second moment ('bfloat16' halves the nu
    # read+write HBM traffic in the weight-update phase; arithmetic stays
    # f32 — steps.py:scale_by_adam_no_mu). Opt-in: rounding the stored
    # moment deviates from reference numerics.
    opt_state_dtype: str = "float32"
    n_devices: int | None = None      # None -> all local devices
    remat: bool = False               # checkpoint synthesis blocks (1024px)
    # run the low-channel high-res trunk in space-to-depth layout
    # (ops/packed.py): every conv of a block whose width is lane-sparse
    # executes as one dense packed conv. Exact math (fp reassociation
    # only); measured 2.5x at 1024px, +2% at 256px — default ON.
    packed_trunk: bool = True
    # packing thresholds (models/stylegan2._synthesis gate): pack pairs with
    # width <= packed_max_ch at res >= packed_min_res. Defaults are the
    # round-2 measured winners; bench.py sweeps them (round-3 VERDICT #8)
    packed_max_ch: int = 64
    packed_min_res: int = 64
    # in-loop FID runs interleaved with training (a few feature batches per
    # iteration on the same device stream) instead of stalling the loop for
    # the full 50k-sample pass like the reference (train.py:436-441)
    fid_overlap: bool = True
    fid_batches_per_iter: int = 2
    # fuse K iterations (full regularizer cadence included, via lax.cond on
    # the iteration index) into ONE lax.scan dispatch — amortizes the
    # per-dispatch host cost of flattening >800-leaf pytrees, which dominates
    # wall time on slow/tunneled hosts (train/steps.py:make_multi_step). The
    # loop automatically falls back to single steps around sample/checkpoint
    # boundaries and short runs; 1 disables the fused path entirely.
    steps_per_dispatch: int = 16
    # when to ship the next window's real batches to the device.
    # 'overlap': put while the current window computes (a PCIe host's free
    # lunch). 'serial': drain the window, put while the device is idle,
    # then dispatch — for transports whose idle puts are much faster than
    # busy puts. 'auto' (default): the loop drains window 1, probes both
    # regimes with 3x64 MB incompressible puts each (train/loop.py:
    # put_probe), measures clean forced-serial windows, then picks by the
    # wall model (decide_put_mode); probes + decision land in
    # metrics.jsonl, with a periodic busy re-probe. Background: the
    # tunneled axon relay moves puts at ~800 MB/s until the first
    # device->host fetch of a computed result, then caps at ~11-28 MB/s
    # for the life of the process (tools/bench_transfer.py four-regime
    # taxonomy, docs/ROUND5_NOTES.md) — data_echo below is the mitigation
    # when that cap cannot feed the chip.
    input_put: str = "auto"
    # data echoing factor (Choi et al. 2020): each shipped real batch is
    # consumed `data_echo` times per K-window (repeats land K/e iterations
    # apart), cutting the input wire bytes e-fold. OPT-IN mitigation for
    # transports whose host->device put bandwidth cannot feed the chip
    # (the tunneled relay caps at ~28 MB/s after the first device fetch
    # while 1024px batch-16 consumes ~60 MB/s — docs/ROUND5_NOTES.md).
    # Default 1 is reference-exact: every iteration sees a fresh batch.
    data_echo: int = 1

    def __post_init__(self):
        # only train.py's argparse restricts choices; programmatic use (e.g.
        # a typo like 'Serial') must fail loudly, not fall into one branch
        if self.input_put not in ("auto", "overlap", "serial"):
            raise ValueError(
                f"input_put must be 'auto', 'overlap' or 'serial', "
                f"got {self.input_put!r}")
        if self.kd_mode not in KNOWLEDGE_DISTILLATION_MODE:
            raise ValueError(f"kd_mode must be one of "
                             f"{KNOWLEDGE_DISTILLATION_MODE}, "
                             f"got {self.kd_mode!r}")
        if self.data_echo < 1:
            raise ValueError(f"data_echo must be >= 1, got {self.data_echo}")

    @property
    def g_reg_ratio(self) -> float:
        return self.g_reg_freq / (self.g_reg_freq + 1)

    @property
    def d_reg_ratio(self) -> float:
        return self.d_reg_freq / (self.d_reg_freq + 1)
