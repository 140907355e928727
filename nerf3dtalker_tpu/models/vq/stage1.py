"""Stage-1 Standardized Space: dual-codebook VQ autoencoder over images.

Functional equivalent of reference `VQAutoEncoder`
(StandardizedSpace/models/stage1_vocaset.py:11-128): a transformer VQ-GAN
that refines NeRF-rendered frames toward ground truth, conditioned on
facial Action-Unit features through a second (AU) codebook:

  image -> conv stem (3->64->1 ch, stage1_vocaset.py:182-194)
        -> row tokenization + Linear(W -> hidden) (:204)
        -> Conv1d squasher over the token axis (:206-228, quant_factor=0)
        -> 6-layer/8-head transformer encoder (:229-242)
        -> split into zquant_dim sub-codes -> image codebook (n=8192)
  AU features -> AU codebook (n=500)                        (:21-23,39-46)
  concat quantized streams -> transformer decoder -> row de-tokenization
        -> conv head (1->64->3) (:336-347)

Deviations from the reference (deliberate, TPU-first): channels-last
layouts; the decoder consumes the concatenated [image-tokens | AU-tokens]
sequence directly instead of the reference's shape-juggling permute/view
chain (stage1_vocaset.py:48-56), which encodes the same information.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax.numpy as jnp

from nerf3dtalker_tpu.config import VQConfig
from nerf3dtalker_tpu.models.vq.quantizer import VectorQuantizer
from nerf3dtalker_tpu.models.vq.transformer import (
    LinearEmbedding,
    Transformer,
    sinusoidal_positions,
)


class VQForwardResult(NamedTuple):
    recon: jnp.ndarray        # [B, H, W, 3]
    quant_loss: jnp.ndarray
    perplexity: jnp.ndarray
    indices: jnp.ndarray      # image-codebook ids


def _replicate_pad_1d(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """replicate ('edge') padding along the token axis, [B, N, C]."""
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)), mode="edge")


class ConvSquasher(nn.Module):
    """Conv1d(k=5, replicate pad) + LeakyReLU + InstanceNorm
    (stage1_vocaset.py:206-212, quant_factor=0 -> stride 1)."""

    dim: int
    neg_slope: float = 0.2

    @nn.compact
    def __call__(self, x):  # [B, N, C]
        x = _replicate_pad_1d(x, 2)
        x = nn.Conv(self.dim, (5,), padding="VALID", name="conv")(x)
        x = nn.leaky_relu(x, self.neg_slope)
        # InstanceNorm1d: normalize over the token axis per channel
        mean = jnp.mean(x, axis=1, keepdims=True)
        var = jnp.var(x, axis=1, keepdims=True)
        return (x - mean) / jnp.sqrt(var + 1e-5)


class VQEncoder(nn.Module):
    cfg: VQConfig

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        """[B, H, W, 3] -> tokens [B, H, hidden]."""
        c = self.cfg
        x = nn.Conv(64, (3, 3), padding="SAME", name="stem0")(img)
        x = nn.relu(x)
        x = nn.Conv(1, (3, 3), padding="SAME", name="stem1")(x)     # [B,H,W,1]
        x = x[..., 0]                                               # [B,H,W]
        x = nn.Dense(c.hidden_size, name="row_embed")(x)            # [B,H,hid]
        x = ConvSquasher(c.hidden_size, name="squasher")(x)
        x = LinearEmbedding(c.hidden_size, name="lin_embed")(x)
        x = x + sinusoidal_positions(x.shape[1], c.hidden_size)
        x = Transformer(
            c.hidden_size, c.num_hidden_layers, c.num_attention_heads,
            c.intermediate_size, name="transformer",
        )(x)
        return x


class VQDecoder(nn.Module):
    cfg: VQConfig
    out_width: int

    @nn.compact
    def __call__(self, tokens: jnp.ndarray) -> jnp.ndarray:
        """[B, N, hidden] -> [B, N_img_rows, W, 3]. The first
        `out_rows` tokens carry image content; AU tokens are context."""
        c = self.cfg
        x = ConvSquasher(c.hidden_size, name="expander")(tokens)
        x = LinearEmbedding(c.hidden_size, name="lin_embed")(x)
        x = x + sinusoidal_positions(x.shape[1], c.hidden_size)
        x = Transformer(
            c.hidden_size, c.num_hidden_layers, c.num_attention_heads,
            c.intermediate_size, name="transformer",
        )(x)
        x = x[:, : self.cfg.img_size]                       # image rows
        x = nn.Dense(self.out_width, name="row_unembed")(x)  # [B,H,W]
        x = x[..., None]
        x = nn.Conv(64, (3, 3), padding="SAME", name="head0")(x)
        x = nn.relu(x)
        return nn.Conv(3, (3, 3), padding="SAME", name="head1")(x)


class VQAutoEncoder(nn.Module):
    cfg: VQConfig

    def setup(self):
        c = self.cfg
        self.encoder = VQEncoder(c, name="encoder")
        self.decoder = VQDecoder(c, out_width=c.img_size, name="decoder")
        self.quantize = VectorQuantizer(c.n_embed, c.embed_dim, c.beta, name="quantize")
        self.quantize_au = VectorQuantizer(
            c.n_embed_au, c.embed_dim, c.beta, name="quantize_au"
        )
        self.au_proj = nn.Dense(c.embed_dim, name="au_proj")

    def encode(self, img):
        """image -> quantized codes (stage1_vocaset.py:28-37)."""
        c = self.cfg
        h = self.encoder(img)                                # [B, H, hid]
        B = h.shape[0]
        h = h.reshape(B, -1, c.embed_dim)                    # sub-code split
        return self.quantize(h)

    def encode_au(self, au_fea):
        """AU features [B, n_au, au_dim] -> quantized AU codes
        (stage1_vocaset.py:39-46)."""
        c = self.cfg
        z = self.au_proj(au_fea)                             # [B, n_au, e_dim]
        return self.quantize_au(z)

    def decode(self, quant_img, quant_au):
        """Concatenate both quantized streams and decode
        (stage1_vocaset.py:48-70)."""
        c = self.cfg
        B = quant_img.shape[0]
        img_tokens = quant_img.reshape(B, -1, c.hidden_size)
        au_tokens = quant_au.reshape(B, -1, c.embed_dim)
        au_tokens = jnp.tile(
            au_tokens, (1, 1, c.hidden_size // c.embed_dim)
        )  # lift AU codes to hidden width
        tokens = jnp.concatenate([img_tokens, au_tokens], axis=1)
        return self.decoder(tokens)

    def __call__(self, img, au_fea) -> VQForwardResult:
        q = self.encode(img)
        qa = self.encode_au(au_fea)
        recon = self.decode(q.quantized, qa.quantized)
        return VQForwardResult(
            recon=recon,
            quant_loss=q.loss + qa.loss,
            perplexity=q.perplexity,
            indices=q.indices,
        )

    def decode_from_indices(self, indices, au_indices):
        """Code ids -> image (stage1_vocaset.py:110-117)."""
        qi = self.quantize.codebook_entry(indices)
        qa = self.quantize_au.codebook_entry(au_indices)
        return self.decode(qi, qa)

    def decode_logit(self, logits, au_indices):
        """Code logits [B, L, n_embed] (or ids [B, L]) -> image
        (stage1_vocaset.py:120-128): top-1 over the logit distribution,
        then decode through the codebook."""
        ix = jnp.argmax(logits, axis=-1) if logits.ndim == 3 else logits
        return self.decode_from_indices(ix, au_indices)


def sample_code_logits(
    rng, logits, sample: bool = True, temperature: float = 0.7
):
    """Sample code ids from logits (stage1_vocaset.py:130-149 get_logit):
    temperature-scaled categorical sampling when `sample`, else top-1.
    Returns (ids [B, L], probs [B, L, n_embed])."""
    import jax

    logits = logits / temperature
    probs = jax.nn.softmax(logits, axis=-1)
    if sample:
        ix = jax.random.categorical(rng, logits, axis=-1)
    else:
        ix = jnp.argmax(probs, axis=-1)
    return ix, probs
