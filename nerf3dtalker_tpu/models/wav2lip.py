"""Wav2Lip lip-sync generator + SyncNet expert (flax, NHWC).

Equivalents of reference `wav_models/wav2lip.py:8-125` (U-Net face
encoder/decoder + wav2lip audio encoder, skip concats, sigmoid RGB head)
and `wav_models/syncnet.py:7-70` (SyncNet_color). In the reference the
generator runs frozen *inside the data loader* to synthesize a lip-synced
reference frame per item (XGaze_utils/data_loader_xgaze_new.py:952-965);
here it is a batched jittable function for the offline preprocessing stage.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class ConvBN(nn.Module):
    """Conv + BatchNorm + ReLU with optional residual (wav_models/conv.py)."""

    cout: int
    kernel: int
    stride: Tuple[int, int] = (1, 1)
    padding: int = 1
    residual: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.padding
        y = nn.Conv(
            self.cout, (self.kernel, self.kernel), strides=self.stride,
            padding=[(p, p), (p, p)], name="conv",
        )(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn")(y)
        if self.residual:
            y = y + x
        return nn.relu(y)


class ConvTransposeBN(nn.Module):
    """ConvTranspose + BN + ReLU (wav_models/conv.py Conv2dTranspose).

    torch ConvTranspose2d(k, s, p, output_padding=op) output size
    = (in-1)*s - 2p + k + op; replicated here with flax ConvTranspose and
    matching explicit padding.
    """

    cout: int
    kernel: int
    stride: int
    padding: int
    output_padding: int = 0

    @nn.compact
    def __call__(self, x, train: bool = False):
        k, s, p, op = self.kernel, self.stride, self.padding, self.output_padding
        # flax ConvTranspose pad semantics differ from torch: torch crops
        # p from both sides and appends op at the end.
        pad = (k - 1 - p, k - 1 - p + op)
        y = nn.ConvTranspose(
            self.cout, (k, k), strides=(s, s), padding=[pad, pad], name="conv",
        )(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn")(y)
        return nn.relu(y)


def _audio_encoder_spec(extra_residual: bool = False):
    """(cout, k, stride, pad, residual) — Wav2Lip's 13-layer audio encoder
    (wav2lip.py:38-56); SyncNet's has one extra 256-residual layer
    (syncnet.py:36-53, `extra_residual=True`)."""
    spec = [
        (32, 3, (1, 1), 1, False), (32, 3, (1, 1), 1, True), (32, 3, (1, 1), 1, True),
        (64, 3, (3, 1), 1, False), (64, 3, (1, 1), 1, True), (64, 3, (1, 1), 1, True),
        (128, 3, (3, 3), 1, False), (128, 3, (1, 1), 1, True), (128, 3, (1, 1), 1, True),
        (256, 3, (3, 2), 1, False), (256, 3, (1, 1), 1, True),
    ]
    if extra_residual:
        spec.append((256, 3, (1, 1), 1, True))
    return spec + [(512, 3, (1, 1), 0, False), (512, 1, (1, 1), 0, False)]


class AudioEncoder(nn.Module):
    extra_residual: bool = False

    @nn.compact
    def __call__(self, mel, train: bool = False):
        x = mel  # [B, 80, 16, 1]
        for i, (c, k, s, p, r) in enumerate(
            _audio_encoder_spec(self.extra_residual)
        ):
            x = ConvBN(c, k, s, p, residual=r, name=f"l{i}")(x, train)
        return x  # [B, 1, 1, 512]


class Wav2Lip(nn.Module):
    """96x96 face U-Net conditioned on the audio embedding."""

    @nn.compact
    def __call__(self, mel, faces, train: bool = False):
        """mel [B, 80, 16, 1]; faces [B, 96, 96, 6] (masked ref + pose src,
        wav2lip.py:91-99) -> [B, 96, 96, 3] in [0,1]."""
        enc_specs: Sequence[Sequence] = [
            [(16, 7, (1, 1), 3, False)],
            [(32, 3, (2, 2), 1, False), (32, 3, (1, 1), 1, True), (32, 3, (1, 1), 1, True)],
            [(64, 3, (2, 2), 1, False)] + [(64, 3, (1, 1), 1, True)] * 3,
            [(128, 3, (2, 2), 1, False)] + [(128, 3, (1, 1), 1, True)] * 2,
            [(256, 3, (2, 2), 1, False)] + [(256, 3, (1, 1), 1, True)] * 2,
            [(512, 3, (2, 2), 1, False), (512, 3, (1, 1), 1, True)],
            [(512, 3, (1, 1), 0, False), (512, 1, (1, 1), 0, False)],
        ]
        feats = []
        x = faces
        for bi, block in enumerate(enc_specs):
            for li, (c, k, s, p, r) in enumerate(block):
                x = ConvBN(c, k, s, p, residual=r, name=f"face_enc_{bi}_{li}")(x, train)
            feats.append(x)

        audio = AudioEncoder(name="audio_encoder")(mel, train)

        # decoder: (transpose spec, n residual convs) per wav2lip.py:58-85
        dec_specs = [
            None,                     # block 0: plain 1x1 conv
            (512, 3, 1, 0, 0, 1),     # -> 3x3
            (512, 3, 2, 1, 1, 2),     # -> 6x6
            (384, 3, 2, 1, 1, 2),     # -> 12x12
            (256, 3, 2, 1, 1, 2),     # -> 24x24
            (128, 3, 2, 1, 1, 2),     # -> 48x48
            (64, 3, 2, 1, 1, 2),      # -> 96x96
        ]
        x = audio
        for bi, spec in enumerate(dec_specs):
            if spec is None:
                x = ConvBN(512, 1, (1, 1), 0, name="face_dec_0_0")(x, train)
            else:
                c, k, s, p, op, nres = spec
                x = ConvTransposeBN(c, k, s, p, op, name=f"face_dec_{bi}_t")(x, train)
                for li in range(nres):
                    x = ConvBN(c, k, (1, 1), p, residual=True,
                               name=f"face_dec_{bi}_{li}")(x, train)
            x = jnp.concatenate([x, feats.pop()], axis=-1)

        x = ConvBN(32, 3, (1, 1), 1, name="out_conv")(x, train)
        x = nn.Conv(3, (1, 1), name="out_rgb")(x)
        return nn.sigmoid(x)


class SyncNetColor(nn.Module):
    """Lip-sync expert (syncnet.py:7-70): face half + mel -> unit
    embeddings whose cosine similarity scores sync."""

    @nn.compact
    def __call__(self, mel, face_half, train: bool = False):
        """mel [B,80,16,1]; face_half [B,48,96,15] (5 stacked frames)."""
        face_spec = [
            (32, 7, (1, 1), 3, False),
            (64, 5, (1, 2), 1, False), (64, 3, (1, 1), 1, True), (64, 3, (1, 1), 1, True),
            (128, 3, (2, 2), 1, False), (128, 3, (1, 1), 1, True),
            (128, 3, (1, 1), 1, True), (128, 3, (1, 1), 1, True),
            (256, 3, (2, 2), 1, False), (256, 3, (1, 1), 1, True), (256, 3, (1, 1), 1, True),
            (512, 3, (2, 2), 1, False), (512, 3, (1, 1), 1, True), (512, 3, (1, 1), 1, True),
            (512, 3, (2, 2), 1, False), (512, 3, (1, 1), 0, False), (512, 1, (1, 1), 0, False),
        ]
        f = face_half
        for i, (c, k, s, p, r) in enumerate(face_spec):
            f = ConvBN(c, k, s, p, residual=r, name=f"face_{i}")(f, train)
        # syncnet.py:47-48: one more 256-residual layer than Wav2Lip's
        a = AudioEncoder(extra_residual=True, name="audio_encoder")(mel, train)
        f = f.reshape(f.shape[0], -1)
        a = a.reshape(a.shape[0], -1)
        f = f / jnp.maximum(jnp.linalg.norm(f, axis=-1, keepdims=True), 1e-8)
        a = a / jnp.maximum(jnp.linalg.norm(a, axis=-1, keepdims=True), 1e-8)
        return a, f
