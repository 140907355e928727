"""Unified configuration for the framework.

Replaces the reference's four coexisting config systems (argparse
`BaseOptions` at HeadNeRFOptions.py:5-34, YAML CfgNode at
StandardizedSpace/base/config.py:10-74, yacs for SadTalker/SPECTRE, and the
`HParams` audio singletons at hparams.py:15-60) with plain frozen
dataclasses that are hashable (usable as jit static args) and
self-describing in checkpoints (the reference embeds `para` in checkpoints,
talker_trainer.py:915-918 — we keep that idea by serializing these
dataclasses alongside orbax state).
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class NeRFConfig:
    """Hyperparameters of the audio-conditioned HeadNeRF core.

    Field semantics mirror reference HeadNeRFOptions.py:5-34; defaults are the
    published Reso32 scale. Use :func:`reso32` / :func:`reso64` presets.
    """

    bg_type: str = "white"

    iden_code_dims: int = 100
    expr_code_dims: int = 79
    text_code_dims: int = 100
    illu_code_dims: int = 27

    num_sample_coarse: int = 64
    num_sample_fine: int = 128

    world_z1: float = 2.5
    world_z2: float = -3.5
    mlp_hidden: int = 384

    featmap_size: int = 32
    featmap_nc: int = 256
    pred_img_size: int = 256

    # positional encoding (HeadNeRFNet.py:27-31)
    vp_n_freqs: int = 10
    vp_include_input: bool = True
    vd_n_freqs: int = 4
    vd_include_input: bool = True

    include_vd: bool = False
    hier_sampling: bool = False

    audio_style_dims: int = 64

    # gaze conditioning (HeadNeRFNet.py:11-17); off by default like the
    # reference's main path
    include_gaze: bool = False
    eye_gaze_dim: int = 2

    # ---- derived dims ----
    @property
    def shape_code_dims(self) -> int:
        """iden + expr (HeadNeRFNet.py:38)."""
        return self.iden_code_dims + self.expr_code_dims

    @property
    def appea_code_dims(self) -> int:
        """text + illu (HeadNeRFNet.py:39)."""
        return self.text_code_dims + self.illu_code_dims

    @property
    def vp_pe_dims(self) -> int:
        d = self.vp_n_freqs * 6
        return d + 3 if self.vp_include_input else d

    @property
    def vd_pe_dims(self) -> int:
        d = self.vd_n_freqs * 6
        return d + 3 if self.vd_include_input else d

    @property
    def vp_channels(self) -> int:
        """MLP position-branch input channels *excluding* the audio style
        (HeadNeRFNet.py:49-52): PE(63) + shape(179) [+ gaze]."""
        c = self.shape_code_dims + self.vp_pe_dims
        if self.include_gaze:
            c += self.eye_gaze_dim
        return c

    @property
    def vd_channels(self) -> int:
        """View/appearance-branch channels (HeadNeRFNet.py:56-62)."""
        c = self.appea_code_dims
        if self.include_vd:
            c += self.vd_pe_dims
        return c

    @property
    def n_rays(self) -> int:
        return self.featmap_size * self.featmap_size

    @property
    def n_upsample_blocks(self) -> int:
        import math

        return int(math.log2(self.pred_img_size) - math.log2(self.featmap_size))


def reso32() -> NeRFConfig:
    return NeRFConfig(featmap_size=32, featmap_nc=256, pred_img_size=256)


def reso64() -> NeRFConfig:
    return NeRFConfig(featmap_size=64, featmap_nc=256, pred_img_size=512)


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    """Mel-spectrogram pipeline parameters (reference hparams.py:15-60)."""

    sample_rate: int = 16000
    n_fft: int = 800
    hop_size: int = 200
    win_size: int = 800
    num_mels: int = 80
    fmin: float = 55.0
    fmax: float = 7600.0
    min_level_db: float = -100.0
    ref_level_db: float = 20.0
    preemphasis: float = 0.97
    preemphasize: bool = True
    signal_normalization: bool = True
    allow_clipping_in_normalization: bool = True
    symmetric_mels: bool = True
    max_abs_value: float = 4.0
    fps: int = 25
    mel_step_size: int = 16
    # syncnet offset used when chunking per-frame mels
    # (data_loader_xgaze_new.py:637-645)


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training-driver hyperparameters (HeadNeRFOptions.py:77-88 +
    talker_trainer.py:665,722-727)."""

    # frame batch per optimizer step. The reference trains B=1
    # (talker_trainer.py:704-714); B=2 is the measured TPU sweet spot —
    # the bg render pass and step overheads amortize across frames
    # (+3% rays/s, scripts/bench_batch.py) with identical semantics to
    # 2-way data parallelism
    batch_size: int = 2
    epochs: int = 30
    lr: float = 1e-4
    lr_audio: float = 1e-4
    step_lr_every: int = 100
    step_lr_gamma: float = 0.1
    use_vgg_loss: bool = True
    # optional path to VGG16 weights for the perceptual loss: either a
    # torch `vgg16().features.state_dict()` file or an .npz of the same
    # keys. Empty -> deterministic random-projection VGG features (the
    # loss term is still computed; see models/perceptual.py:load_vgg16).
    vgg_weights: str = ""
    # precompute the masked-GT VGG activations per frame (parameter-
    # independent) so each step runs only the prediction branch
    vgg_precompute_gt: bool = True
    seed: int = 0
    # route training batches through the C++ threaded prefetcher
    # (native/nerf3dt_native.cpp); falls back to the Python loader if the
    # shared library can't be built
    native_prefetch: bool = False
    # keep the whole frame dataset (incl. precomputed VGG planes) resident
    # in HBM and gather batches on-device — per-step host->device traffic
    # drops to the frame indices. The dominant cost of the sustained
    # training loop otherwise is batch upload (~63 MB/frame at Reso64 with
    # VGG planes). Falls back to the host loader above this budget.
    device_cache: bool = True
    device_cache_bytes: int = 6 * 1024**3
    bf16_compute: bool = True
    ckpt_dir: str = "./logs/ckpt"
    log_dir: str = "./logs"
    # --- observability (utils/observability.py; replaces the reference's
    # SummaryWriter at talker_trainer.py:623 / train_vq.py:108) ---
    # write per-epoch metrics.jsonl under log_dir
    metric_log: bool = True
    # mirror metrics to TensorBoard scalars when torch.utils.tensorboard
    # is importable
    use_tensorboard: bool = False
    # capture a jax.profiler trace of `trace_steps` training steps of the
    # first epoch into trace_dir (Perfetto/TB-profile viewable)
    trace_dir: str = ""
    trace_steps: int = 5
    # --- failure recovery (utils/guards.py StepGuard; first-class version
    # of the reference's print-and-continue at talker_trainer.py:1071-1073
    # and its resume-from-checkpoint recovery, :1167-1201) ---
    # what to do when an epoch contains non-finite steps:
    #   "warn"     log and continue (params already protected per-step by
    #              guarded_update inside the jitted step)
    #   "rollback" restore params+optimizer from the last checkpoint
    #   "abort"    raise after `guard_max_bad` cumulative bad steps
    guard_policy: str = "warn"
    guard_max_bad: int = 10
    # validate every k-th epoch (and always the last); per-epoch SSIM on
    # 512^2 frames is host work + a tunnel round trip, so long runs
    # thin it out
    val_every: int = 1


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh layout for multi-chip runs.

    Replaces the reference's NCCL process-group setup
    (StandardizedSpace/main/train_vq.py:98-122) with a declarative JAX mesh:
    `data` shards batch/frames, `rays` shards the ray dimension of the NeRF
    (the embarrassingly-parallel axis, SURVEY.md P6).
    """

    data: int = 1
    rays: int = 1

    @property
    def axis_names(self) -> Tuple[str, str]:
        return ("data", "rays")


@dataclasses.dataclass(frozen=True)
class VQConfig:
    """Standardized-Space VQ-VAE (reference stage1_vocaset.py:11-27 +
    config/vocaset/stage1.yaml)."""

    in_dim: int = 3
    hidden_size: int = 512
    embed_dim: int = 64
    n_embed: int = 8192          # image codebook
    n_embed_au: int = 500        # AU codebook
    num_hidden_layers: int = 6
    num_attention_heads: int = 8
    intermediate_size: int = 1536
    beta: float = 0.25
    img_size: int = 256
    quant_factor: int = 0        # temporal squash factor of the conv squasher
    face_quan_num: int = 8       # codes per face token group
    au_dim: int = 256            # AU classifier feature width fed to codebook
    n_au: int = 5                # AU10/14/20/25/26
