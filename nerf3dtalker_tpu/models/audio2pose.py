"""SadTalker Audio2Pose CVAE (flax).

Equivalent of reference `s_audio2pose_models/`: `Audio2Pose`
(audio2pose.py:7-48) wraps a frozen wav2lip audio encoder, a CVAE over
6-dof pose-motion sequences with 46 pose-style class biases
(cvae.py:13-131), a ResUnet pose embedder (res_unet.py), and a
`PoseSequenceDiscriminator` (discriminator.py:59). The reference pipeline
bypasses it at inference (`s_test_audio2coeff.py:36-54` keeps the
Savitzky-Golay-smoothed reference pose) — provided here for capability
parity and training.
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ResUnet1D(nn.Module):
    """Small conv residual embedder over [B, T, 6] pose-motion sequences
    (res_unet.py:6 ResUnet; exact internal topology simplified to the same
    in/out contract: per-step embedding preserved, residual conv stack)."""

    width: int = 32

    @nn.compact
    def __call__(self, x):
        y = nn.Conv(self.width, (3,), padding="SAME", name="in_conv")(x)
        for i in range(2):
            r = nn.relu(nn.Conv(self.width, (3,), padding="SAME", name=f"res{i}_1")(y))
            r = nn.Conv(self.width, (3,), padding="SAME", name=f"res{i}_2")(r)
            y = nn.relu(y + r)
        return nn.Conv(x.shape[-1], (3,), padding="SAME", name="out_conv")(y)


class CVAEEncoder(nn.Module):
    """(pose motion, ref pose, audio emb, class bias) -> (mu, logvar)
    (cvae.py ENCODER :44-96)."""

    layer_sizes: Sequence[int] = (192, 128)
    latent_size: int = 64
    num_classes: int = 46
    audio_emb_out: int = 6
    seq_len: int = 32

    @nn.compact
    def __call__(self, pose_motion, ref, audio_emb, class_id):
        B = pose_motion.shape[0]
        pose_emb = ResUnet1D(name="resunet")(pose_motion).reshape(B, -1)
        audio = nn.Dense(self.audio_emb_out, name="linear_audio")(audio_emb)
        audio = audio.reshape(B, -1)
        classbias = self.param(
            "classbias", nn.initializers.normal(1.0),
            (self.num_classes, self.latent_size),
        )
        x = jnp.concatenate(
            [ref, pose_emb, audio, classbias[class_id]], axis=-1
        )
        for i, s in enumerate(self.layer_sizes):
            x = nn.relu(nn.Dense(s, name=f"L{i}")(x))
        mu = nn.Dense(self.latent_size, name="linear_means")(x)
        logvar = nn.Dense(self.latent_size, name="linear_logvar")(x)
        return mu, logvar


class CVAEDecoder(nn.Module):
    """(z, ref, audio emb, class bias) -> pose motion [B, T, 6]
    (cvae.py DECODER :98-131+)."""

    layer_sizes: Sequence[int] = (128, 192)
    latent_size: int = 64
    num_classes: int = 46
    audio_emb_out: int = 6
    seq_len: int = 32

    @nn.compact
    def __call__(self, z, ref, audio_emb, class_id):
        B = z.shape[0]
        audio = nn.Dense(self.audio_emb_out, name="linear_audio")(audio_emb)
        audio = audio.reshape(B, -1)
        classbias = self.param(
            "classbias", nn.initializers.normal(1.0),
            (self.num_classes, self.latent_size),
        )
        x = jnp.concatenate([z + classbias[class_id], ref, audio], axis=-1)
        for i, s in enumerate(self.layer_sizes):
            x = nn.Dense(s, name=f"L{i}")(x)
            x = nn.relu(x) if i + 1 < len(self.layer_sizes) else nn.sigmoid(x)
        x = x.reshape(B, self.seq_len, -1)
        x = ResUnet1D(name="resunet")(x)
        return nn.Dense(6, name="pose_linear")(x)


class Audio2PoseCVAE(nn.Module):
    """Full CVAE: encode GT motion -> reparameterize -> decode
    (cvae.py:31-43); `generate` samples z ~ N(0, I) at test time."""

    latent_size: int = 64
    num_classes: int = 46
    seq_len: int = 32

    def setup(self):
        ls = self.latent_size
        sizes_enc = (192, 128)
        self.encoder = CVAEEncoder(
            sizes_enc, ls, self.num_classes, seq_len=self.seq_len, name="encoder"
        )
        self.decoder = CVAEDecoder(
            tuple(reversed(sizes_enc)), ls, self.num_classes,
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


def cvae_loss(pred, gt, mu, logvar, kl_weight: float = 1.0):
    """Reconstruction + KL (the standard CVAE objective of the trainer)."""
    rec = jnp.mean((pred - gt) ** 2)
    kl = -0.5 * jnp.mean(1 + logvar - mu ** 2 - jnp.exp(logvar))
    return rec + kl_weight * kl, {"rec": rec, "kl": kl}


class PoseSequenceDiscriminator(nn.Module):
    """Temporal conv discriminator over pose sequences
    (discriminator.py:59): stacked Conv1d + LeakyReLU -> scalar logit."""

    @nn.compact
    def __call__(self, seq):
        x = seq  # [B, T, 6]
        for i, c in enumerate((64, 128, 256)):
            x = nn.Conv(c, (3,), strides=(2,), padding="SAME", name=f"conv{i}")(x)
            x = nn.leaky_relu(x, 0.2)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(1, name="out")(x)


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
