"""SadTalker Audio2Pose CVAE (flax).

Equivalent of reference `s_audio2pose_models/`: `Audio2Pose`
(audio2pose.py:7-48) wraps a frozen wav2lip audio encoder, a CVAE over
6-dof pose-motion sequences with 46 pose-style class biases
(cvae.py:13-149), the 2D ResUnet pose embedder (res_unet.py:6-66 with
networks.py ResidualConv/Upsample), and a `PoseSequenceDiscriminator`
(discriminator.py:59-75). The reference pipeline bypasses it at
inference (`s_test_audio2coeff.py:36-54` keeps the
Savitzky-Golay-smoothed reference pose) — provided here for capability
parity and training. All modules are layer-faithful so converted
reference checkpoints drop in (utils/convert.convert_audio2pose_cvae;
source parity: tests/test_reference_source_parity.py).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ResidualConv(nn.Module):
    """networks.py:5-31: (BN, ReLU, Conv s, BN, ReLU, Conv 1) + skip
    (Conv s, BN). NHWC; `stride` applies to the time axis only."""

    out_ch: int
    stride: Tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x, train: bool = False):
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       name=name)
        y = nn.relu(bn("bn1")(x))
        y = nn.Conv(self.out_ch, (3, 3), strides=self.stride,
                    padding=[(1, 1), (1, 1)], name="conv1")(y)
        y = nn.relu(bn("bn2")(y))
        y = nn.Conv(self.out_ch, (3, 3), padding=[(1, 1), (1, 1)],
                    name="conv2")(y)
        s = nn.Conv(self.out_ch, (3, 3), strides=self.stride,
                    padding=[(1, 1), (1, 1)], name="skip_conv")(x)
        s = bn("skip_bn")(s)
        return y + s


class ResUnet2D(nn.Module):
    """res_unet.py:6-66 ResUnet over [B, T, 6, 1] pose-motion planes
    (torch layout [B, 1, T, 6]): 3-level stride-(2,1) residual encoder,
    ConvTranspose-(2,1) decoder with skip concats, sigmoid 1-ch output."""

    filters: Sequence[int] = (32, 64, 128, 256)

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.filters
        bn = lambda name: nn.BatchNorm(use_running_average=not train,
                                       name=name)
        h = nn.Conv(f[0], (3, 3), padding=[(1, 1), (1, 1)],
                    name="in_conv1")(x)
        h = nn.relu(bn("in_bn")(h))
        h = nn.Conv(f[0], (3, 3), padding=[(1, 1), (1, 1)],
                    name="in_conv2")(h)
        x1 = h + nn.Conv(f[0], (3, 3), padding=[(1, 1), (1, 1)],
                         name="in_skip")(x)
        x2 = ResidualConv(f[1], (2, 1), name="res1")(x1, train)
        x3 = ResidualConv(f[2], (2, 1), name="res2")(x2, train)
        x4 = ResidualConv(f[3], (2, 1), name="bridge")(x3, train)

        u = nn.ConvTranspose(f[3], (2, 1), strides=(2, 1),
                             padding="VALID", name="up1")(x4)
        x6 = ResidualConv(f[2], (1, 1), name="upres1")(
            jnp.concatenate([u, x3], axis=-1), train
        )
        u = nn.ConvTranspose(f[2], (2, 1), strides=(2, 1),
                             padding="VALID", name="up2")(x6)
        x8 = ResidualConv(f[1], (1, 1), name="upres2")(
            jnp.concatenate([u, x2], axis=-1), train
        )
        u = nn.ConvTranspose(f[1], (2, 1), strides=(2, 1),
                             padding="VALID", name="up3")(x8)
        x10 = ResidualConv(f[0], (1, 1), name="upres3")(
            jnp.concatenate([u, x1], axis=-1), train
        )
        return nn.sigmoid(nn.Conv(1, (1, 1), name="out_conv")(x10))


class CVAEEncoder(nn.Module):
    """(pose motion, ref pose, audio emb, class bias) -> (mu, logvar)
    (cvae.py ENCODER :51-97). Faithful quirk: the reference's forward
    assigns BOTH mu and logvar from `linear_means` (cvae.py:95-96 — the
    `linear_logvar` weights exist but are unused); `fix_logvar=True`
    routes logvar through its own head instead."""

    layer_sizes: Sequence[int] = (192, 128)
    latent_size: int = 64
    num_classes: int = 46
    audio_emb_out: int = 6
    seq_len: int = 32
    fix_logvar: bool = False

    @nn.compact
    def __call__(self, pose_motion, ref, audio_emb, class_id,
                 train: bool = False):
        B = pose_motion.shape[0]
        pose_emb = ResUnet2D(name="resunet")(
            pose_motion[..., None], train
        ).reshape(B, -1)
        audio = nn.Dense(self.audio_emb_out, name="linear_audio")(audio_emb)
        audio = audio.reshape(B, -1)
        classbias = self.param(
            "classbias", nn.initializers.normal(1.0),
            (self.num_classes, self.latent_size),
        )
        # concat order per cvae.py:92: [ref, pose_emb, audio, class_bias]
        x = jnp.concatenate(
            [ref, pose_emb, audio, classbias[class_id]], axis=-1
        )
        for i, s in enumerate(self.layer_sizes[1:]):
            x = nn.relu(nn.Dense(s, name=f"L{i}")(x))
        mu = nn.Dense(self.latent_size, name="linear_means")(x)
        lv = nn.Dense(self.latent_size, name="linear_logvar")(x)
        logvar = lv if self.fix_logvar else mu
        return mu, logvar


class CVAEDecoder(nn.Module):
    """(z, ref, audio emb, class bias) -> pose motion [B, T, 6]
    (cvae.py DECODER :99-149): MLP (ReLU between, Sigmoid last) ->
    [B, T, 6] -> ResUnet -> pose_linear."""

    layer_sizes: Sequence[int] = (128, 192)
    latent_size: int = 64
    num_classes: int = 46
    audio_emb_out: int = 6
    seq_len: int = 32

    @nn.compact
    def __call__(self, z, ref, audio_emb, class_id, train: bool = False):
        B = z.shape[0]
        audio = nn.Dense(self.audio_emb_out, name="linear_audio")(audio_emb)
        audio = audio.reshape(B, -1)
        classbias = self.param(
            "classbias", nn.initializers.normal(1.0),
            (self.num_classes, self.latent_size),
        )
        # concat order per cvae.py:139: [ref, z + class_bias, audio]
        x = jnp.concatenate([ref, z + classbias[class_id], audio], axis=-1)
        n = len(self.layer_sizes)
        for i, s in enumerate(self.layer_sizes):
            x = nn.Dense(s, name=f"L{i}")(x)
            x = nn.relu(x) if i + 1 < n else nn.sigmoid(x)
        x = x.reshape(B, self.seq_len, -1)
        x = ResUnet2D(name="resunet")(x[..., None], train)[..., 0]
        return nn.Dense(6, name="pose_linear")(x)


class Audio2PoseCVAE(nn.Module):
    """Full CVAE: encode GT motion -> reparameterize -> decode
    (cvae.py:13-48); `generate` decodes a supplied/sampled z at test
    time (cvae.py test())."""

    latent_size: int = 64
    num_classes: int = 46
    seq_len: int = 32
    encoder_sizes: Sequence[int] = (192, 128)
    decoder_sizes: Sequence[int] = (128, 192)
    fix_logvar: bool = False

    def setup(self):
        self.encoder = CVAEEncoder(
            self.encoder_sizes, self.latent_size, self.num_classes,
            seq_len=self.seq_len, fix_logvar=self.fix_logvar, name="encoder",
        )
        self.decoder = CVAEDecoder(
            self.decoder_sizes, self.latent_size, self.num_classes,
            seq_len=self.seq_len, name="decoder",
        )

    def __call__(self, pose_motion_gt, ref, audio_emb, class_id, rng):
        mu, logvar = self.encoder(pose_motion_gt, ref, audio_emb, class_id)
        eps = jax.random.normal(rng, mu.shape)
        z = mu + eps * jnp.exp(0.5 * logvar)
        pred = self.decoder(z, ref, audio_emb, class_id)
        return {"pose_motion_pred": pred, "mu": mu, "logvar": logvar, "z": z}

    def generate(self, ref, audio_emb, class_id, rng):
        z = jax.random.normal(rng, (ref.shape[0], self.latent_size))
        return self.decoder(z, ref, audio_emb, class_id)

    def decode(self, z, ref, audio_emb, class_id):
        """cvae.py test(): decode a caller-supplied z."""
        return self.decoder(z, ref, audio_emb, class_id)


def cvae_loss(pred, gt, mu, logvar, kl_weight: float = 1.0):
    """Reconstruction + KL (the standard CVAE objective of the trainer)."""
    rec = jnp.mean((pred - gt) ** 2)
    kl = -0.5 * jnp.mean(1 + logvar - mu ** 2 - jnp.exp(logvar))
    return rec + kl_weight * kl, {"rec": rec, "kl": kl}


class ConvNormRelu1D(nn.Module):
    """discriminator.py:5-57 ConvNormRelu, conv_type='1d', norm='BN':
    Conv1d(no bias) -> BN -> (Leaky)ReLU; downsample = k4 s2 p1."""

    out_ch: int
    downsample: bool = False
    leaky: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s, p = (4, 2, 1) if self.downsample else (3, 1, 1)
        x = nn.Conv(self.out_ch, (k,), strides=(s,), padding=[(p, p)],
                    use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, name="norm")(x)
        return nn.leaky_relu(x, 0.2) if self.leaky else nn.relu(x)


class PoseSequenceDiscriminator(nn.Module):
    """discriminator.py:59-75: 6-ch pose sequence -> per-timestep logits
    (256 down, 512 down, 1024 k3, 1-ch head)."""

    leaky: bool = True

    @nn.compact
    def __call__(self, seq, train: bool = False):
        x = seq  # [B, T, 6]
        x = ConvNormRelu1D(256, downsample=True, leaky=self.leaky,
                           name="seq0")(x, train)
        x = ConvNormRelu1D(512, downsample=True, leaky=self.leaky,
                           name="seq1")(x, train)
        x = ConvNormRelu1D(1024, leaky=self.leaky, name="seq2")(x, train)
        x = nn.Conv(1, (3,), padding=[(1, 1)], name="out")(x)
        return x[..., 0]                           # [B, T//4]


def savgol_smooth_pose(poses, window: int = 13, order: int = 2):
    """Savitzky-Golay pose smoothing applied by the reference before use
    (s_test_audio2coeff.py Savitzky-Golay smoothing)."""
    from scipy.signal import savgol_filter
    import numpy as np

    poses = np.asarray(poses)
    window = min(window, len(poses) if len(poses) % 2 else len(poses) - 1)
    if window <= order:
        return poses
    return savgol_filter(poses, window, order, axis=0)
