"""Transformer building blocks for the Standardized Space.

Equivalents of reference `models/lib/base_models.py:9-327` (Norm/Residual/
MLP/Attention/CrossModalAttention/Transformer/LinearEmbedding/
PositionalEncoding), written as flax modules with fused attention einsums.
Pre-LN residual blocks: x += attn(LN(x)); x += mlp(LN(x)) — matching the
reference's Residual(Norm(Attention)) composition.
"""

from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp


class Attention(nn.Module):
    """Multi-head self-attention (base_models.py Attention): qkv from one
    bias-free projection, optional additive mask, out projection."""

    dim: int
    heads: int = 8

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        B, N, _ = x.shape
        h = self.heads
        qkv = nn.Dense(self.dim * 3, use_bias=False, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_first(t):
            return t.reshape(B, N, h, self.dim // h).transpose(0, 2, 1, 3)

        q, k, v = map(heads_first, (q, k, v))
        scale = self.dim ** -0.5
        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
        if mask is not None:
            dots = dots + mask
        attn = nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, N, self.dim)
        return nn.Dense(self.dim, name="to_out")(out)


class CrossModalAttention(nn.Module):
    """Q from modality a, K/V from modality b (base_models.py:63-105)."""

    dim: int
    heads: int = 8

    @nn.compact
    def __call__(self, x_a: jnp.ndarray, x_b: jnp.ndarray,
                 mask: Optional[jnp.ndarray] = None):
        B, Na, _ = x_a.shape
        h = self.heads
        q = nn.Dense(self.dim, use_bias=False, name="to_q")(x_a)
        kv = nn.Dense(self.dim * 2, use_bias=False, name="to_kv")(x_b)
        k, v = jnp.split(kv, 2, axis=-1)

        def heads_first(t):
            return t.reshape(B, t.shape[1], h, self.dim // h).transpose(0, 2, 1, 3)

        q, k, v = map(heads_first, (q, k, v))
        dots = jnp.einsum("bhid,bhjd->bhij", q, k) * self.dim ** -0.5
        if mask is not None:
            dots = dots + mask
        attn = nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Na, self.dim)
        return nn.Dense(self.dim, name="to_out")(out)


class MLP(nn.Module):
    """Linear-GELU-Linear (base_models.py:43-59)."""

    dim: int
    hidden: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.hidden, name="l1")(x)
        x = nn.gelu(x, approximate=False)
        return nn.Dense(self.dim, name="l2")(x)


class TransformerBlock(nn.Module):
    dim: int
    heads: int
    mlp_hidden: int

    @nn.compact
    def __call__(self, x, mask=None):
        x = x + Attention(self.dim, self.heads, name="attn")(
            nn.LayerNorm(epsilon=1e-5, name="norm1")(x), mask
        )
        x = x + MLP(self.dim, self.mlp_hidden, name="mlp")(
            nn.LayerNorm(epsilon=1e-5, name="norm2")(x)
        )
        return x


class Transformer(nn.Module):
    """Stack of pre-LN blocks (base_models.py Transformer)."""

    dim: int
    num_layers: int
    heads: int
    mlp_hidden: int

    @nn.compact
    def __call__(self, x, mask=None):
        for i in range(self.num_layers):
            x = TransformerBlock(
                self.dim, self.heads, self.mlp_hidden, name=f"block_{i}"
            )(x, mask)
        return x


class LinearEmbedding(nn.Module):
    dim: int

    @nn.compact
    def __call__(self, x):
        return nn.Dense(self.dim, name="proj")(x)


def sinusoidal_positions(n: int, dim: int, dtype=jnp.float32) -> jnp.ndarray:
    """Classic sin/cos positional table [n, dim] (base_models.py
    PositionalEncoding)."""
    pos = jnp.arange(n, dtype=dtype)[:, None]
    div = jnp.exp(jnp.arange(0, dim, 2, dtype=dtype) * (-math.log(10000.0) / dim))
    pe = jnp.zeros((n, dim), dtype)
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div))
    return pe


def biased_causal_mask(n: int, period: int = 1) -> jnp.ndarray:
    """ALiBi-style biased causal mask used by CodeTalker stage-2
    (reference models/stage2.py:27-29 `enc_dec_mask`/bias): additive
    -inf above the diagonal plus a distance penalty."""
    i = jnp.arange(n)[:, None]
    j = jnp.arange(n)[None, :]
    causal = jnp.where(j > i, -jnp.inf, 0.0)
    bias = -jnp.abs((i - j) // max(period, 1)).astype(jnp.float32)
    return causal + bias
