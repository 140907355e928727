"""AD-NeRF-style DeepSpeech-feature audio encoders.

Equivalents of reference `lip_nopre_helpers_deform_yuan.py:75-143`:
  * AudioNet — per-frame 16-step window of 29-d DeepSpeech features ->
    dim_aud conditioning vector via strided Conv1d stack;
  * AudioAttNet — temporal attention over a seq_len window of AudioNet
    outputs (smoothing).
These are loaded-`aud.npy` pathway components, kept for capability parity
with the AD-NeRF conditioning mode.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class AudioNet(nn.Module):
    dim_aud: int = 76
    win_size: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [B, 16, 29] DeepSpeech window -> [B, dim_aud]."""
        half = self.win_size // 2
        x = x[:, 8 - half : 8 + half, :]           # [B, win, 29]
        for i, c in enumerate((32, 32, 64, 64)):
            x = nn.Conv(c, (3,), strides=(2,), padding=[(1, 1)], name=f"conv{i}")(x)
            x = nn.leaky_relu(x, 0.02)
        x = x[:, 0]                                 # [B, 64]
        x = nn.leaky_relu(nn.Dense(64, name="fc1")(x), 0.02)
        return nn.Dense(self.dim_aud, name="fc2")(x)


class AudioAttNet(nn.Module):
    dim_aud: int = 32
    seq_len: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x [seq_len, D] -> [D] attention-weighted average."""
        y = x[None, :, : self.dim_aud]              # [1, T, dim_aud]
        for i, c in enumerate((16, 8, 4, 2, 1)):
            y = nn.Conv(c, (3,), padding=[(1, 1)], name=f"att_conv{i}")(y)
            y = nn.leaky_relu(y, 0.02)
        w = nn.Dense(self.seq_len, name="att_fc")(y[0, :, 0])
        w = nn.softmax(w)[:, None]
        return jnp.sum(w * x, axis=0)
