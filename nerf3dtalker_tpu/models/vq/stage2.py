"""CodeTalker stage-2: autoregressive speech-to-motion over the frozen
stage-1 codebook.

Equivalent of reference `StandardizedSpace/models/stage2.py:8-140`:
wav2vec2 audio features (HF; the reference patches in linear-interp frame
resampling, `models/lib/wav2vec.py:1-125` — here :func:`resample_frames`),
style embedding per training subject, periodic positional encoding, a
biased causal target mask (`init_biased_mask`), an enc-dec alignment mask,
a transformer decoder with teacher forcing, zero-initialized code head,
then quantize + decode through the frozen stage-1 VQ autoencoder.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from nerf3dtalker_tpu.config import VQConfig
from nerf3dtalker_tpu.models.vq.transformer import MLP


def resample_frames(features: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Linear-interp resampling of wav2vec2 features to the video frame rate
    (reference models/lib/wav2vec.py linear_interpolation — torch
    F.interpolate with align_corners=True, NOT half-pixel centers)."""
    from nerf3dtalker_tpu.models.vq.wav2vec import resample_frames_aligned

    return resample_frames_aligned(features, target_len)


def periodic_positional_encoding(
    x: jnp.ndarray, period: int = 25, max_len: int = 600
) -> jnp.ndarray:
    """PPE (models/utils.py PeriodicPositionalEncoding): a sin/cos table of
    length `period` tiled over time."""
    d = x.shape[-1]
    pos = jnp.arange(period, dtype=x.dtype)[:, None]
    div = jnp.exp(jnp.arange(0, d, 2, dtype=x.dtype) * (-math.log(10000.0) / d))
    pe = jnp.zeros((period, d), x.dtype)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    reps = (max_len + period - 1) // period
    table = jnp.tile(pe, (reps, 1))
    return x + table[: x.shape[1]]


def init_biased_mask(n_head: int, max_seq_len: int, period: int) -> jnp.ndarray:
    """ALiBi-style biased causal mask [H, T, T] (models/utils.py
    init_biased_mask): per-head geometric slopes x periodized distance,
    -inf above the diagonal."""
    def get_slopes(n):
        def pow2(n):
            start = 2.0 ** (-(2.0 ** -(math.log2(n) - 3)))
            return [start * (start ** i) for i in range(n)]

        if math.log2(n).is_integer():
            return pow2(n)
        closest = 2 ** math.floor(math.log2(n))
        return (
            pow2(closest)
            + get_slopes(2 * closest)[0::2][: n - closest]
        )

    slopes = jnp.asarray(get_slopes(n_head))
    pos = jnp.arange(max_seq_len) // period
    bias = pos[None, :].astype(jnp.float32)
    rel = bias - bias.T  # careful: reference builds per-row shifted bias
    i = jnp.arange(max_seq_len)
    dist = (i[:, None] - i[None, :]) // period
    alibi = -dist.astype(jnp.float32)
    mask = slopes[:, None, None] * alibi[None]
    causal = jnp.where(i[None, :] > i[:, None], -jnp.inf, 0.0)
    return mask + causal[None]


def enc_dec_mask(T: int, S: int, dataset: str = "vocaset") -> jnp.ndarray:
    """Alignment mask [T, S] (models/utils.py enc_dec_mask): frame t may
    only attend to its aligned audio frame(s)."""
    mask = jnp.full((T, S), -jnp.inf)
    i = jnp.arange(min(T, S))
    if dataset == "BIWI":
        m = jnp.full((T, S), -jnp.inf)
        valid = (2 * i + 1) < S
        m = m.at[i, jnp.minimum(2 * i, S - 1)].set(0.0)
        m = m.at[i, jnp.minimum(2 * i + 1, S - 1)].set(0.0)
        return m
    return mask.at[i, i].set(0.0)


class DecoderLayer(nn.Module):
    """Post-LN transformer decoder layer matching torch
    nn.TransformerDecoderLayer (self-attn, cross-attn, FFN)."""

    dim: int
    heads: int

    @nn.compact
    def __call__(self, x, memory, tgt_mask=None, mem_mask=None):
        def mha(q, kv, mask, name):
            B, N, _ = q.shape
            h = self.heads
            qp = nn.Dense(self.dim, name=f"{name}_q")(q)
            kp = nn.Dense(self.dim, name=f"{name}_k")(kv)
            vp = nn.Dense(self.dim, name=f"{name}_v")(kv)

            def split(t):
                return t.reshape(B, t.shape[1], h, self.dim // h).transpose(0, 2, 1, 3)

            qh, kh, vh = split(qp), split(kp), split(vp)
            dots = jnp.einsum("bhid,bhjd->bhij", qh, kh) / math.sqrt(self.dim // h)
            if mask is not None:
                dots = dots + mask
            att = nn.softmax(dots, axis=-1)
            out = jnp.einsum("bhij,bhjd->bhid", att, vh)
            out = out.transpose(0, 2, 1, 3).reshape(B, N, self.dim)
            return nn.Dense(self.dim, name=f"{name}_out")(out)

        x = nn.LayerNorm(name="norm1")(x + mha(x, x, tgt_mask, "self"))
        x = nn.LayerNorm(name="norm2")(x + mha(x, memory, mem_mask, "cross"))
        y = nn.Dense(2 * self.dim, name="ff1")(x)
        y = nn.relu(y)
        y = nn.Dense(self.dim, name="ff2")(y)
        return nn.LayerNorm(name="norm3")(x + y)


class CodeTalker(nn.Module):
    """Speech -> motion-code predictor (stage2.py:8-100). The stage-1
    autoencoder is passed in frozen at call sites."""

    cfg: VQConfig
    feature_dim: int = 64
    n_head: int = 4
    num_layers: int = 1
    period: int = 25
    n_subjects: int = 8
    vertice_dim: int = 15069   # vocaset V*3 default
    max_seq_len: int = 600

    @nn.compact
    def __call__(
        self,
        audio_feats: jnp.ndarray,   # [B, S, 768] wav2vec2 hidden states
        motion_gt: jnp.ndarray,     # [B, T, vertice_dim] (template-relative)
        subject_onehot: jnp.ndarray,  # [B, n_subjects]
        dataset: str = "vocaset",
        subject_onehot2: Optional[jnp.ndarray] = None,
        style_weight: Optional[float] = None,
    ) -> jnp.ndarray:
        """Teacher-forced code logits feature [B, T*face_quan, zquant].

        `subject_onehot2` + `style_weight` blend two subjects' style
        embeddings (the reference's style interpolation at test time,
        stage2.py:108-114)."""
        T = motion_gt.shape[1]
        hidden = nn.Dense(self.feature_dim, name="audio_feature_map")(
            resample_frames(audio_feats, T)
        )
        emb = nn.Embed(self.n_subjects, self.feature_dim, name="style_emb")
        style = emb(jnp.argmax(subject_onehot, axis=1))[:, None]
        if subject_onehot2 is not None and style_weight is not None:
            style2 = emb(jnp.argmax(subject_onehot2, axis=1))[:, None]
            style = style * style_weight + style2 * (1.0 - style_weight)

        shifted = jnp.concatenate(
            [jnp.zeros_like(motion_gt[:, :1]), motion_gt[:, :-1]], axis=1
        )
        x = nn.Dense(self.feature_dim, name="vertice_map")(shifted) + style
        x = periodic_positional_encoding(x, self.period, self.max_seq_len)

        tgt_mask = init_biased_mask(self.n_head, self.max_seq_len, self.period)[
            :, :T, :T
        ]
        mem_mask = enc_dec_mask(T, hidden.shape[1], dataset)[None, None]

        for i in range(self.num_layers):
            x = DecoderLayer(self.feature_dim, self.n_head, name=f"dec_{i}")(
                x, hidden, tgt_mask[None], mem_mask
            )

        # zero-init code head (stage2.py:35)
        feat = nn.Dense(
            self.cfg.face_quan_num * self.cfg.embed_dim, use_bias=False,
            kernel_init=nn.initializers.zeros, name="feat_map",
        )(x)
        B = feat.shape[0]
        return feat.reshape(B, T * self.cfg.face_quan_num, self.cfg.embed_dim)


def stage2_loss(
    codetalker_out: jnp.ndarray,
    gt_quant: jnp.ndarray,
    recon: jnp.ndarray,
    vertice_gt: jnp.ndarray,
    motion_weight: float = 1.0,
    reg_weight: float = 1.0,
):
    """motion MSE + code regression MSE (stage2.py:93-100)."""
    loss_motion = jnp.mean((recon - vertice_gt) ** 2)
    loss_reg = jnp.mean((codetalker_out - jax.lax.stop_gradient(gt_quant)) ** 2)
    return motion_weight * loss_motion + reg_weight * loss_reg, (loss_motion, loss_reg)
