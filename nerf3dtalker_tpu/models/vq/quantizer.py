"""VQ-VAE vector quantizer (taming-transformers lineage).

Equivalent of reference `VectorQuantizer`
(StandardizedSpace/models/lib/quantizer.py:14-91): nearest-codebook lookup,
commitment loss with beta, straight-through estimator, codebook-usage
perplexity.

TPU notes: the distance argmin is computed as one [N, D] @ [D, K] matmul
(MXU) plus norms — the reference's scatter-based one-hot matmul lookup
(quantizer.py:46-52) becomes a `take`, and the one-hot usage histogram for
perplexity is a segment-sum.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class QuantizeResult(NamedTuple):
    quantized: jnp.ndarray    # [..., D] straight-through codes
    loss: jnp.ndarray         # commitment + codebook loss
    perplexity: jnp.ndarray   # exp(entropy of code usage)
    indices: jnp.ndarray      # [...] int32 code ids


class VectorQuantizer(nn.Module):
    n_embed: int
    embed_dim: int
    beta: float = 0.25

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> QuantizeResult:
        """z: [..., embed_dim]."""
        emb = self.param(
            "embedding",
            lambda key, shape: jax.random.uniform(
                key, shape, minval=-1.0 / self.n_embed, maxval=1.0 / self.n_embed
            ),
            (self.n_embed, self.embed_dim),
        )
        flat = z.reshape(-1, self.embed_dim)
        # ||z - e||^2 = ||z||^2 + ||e||^2 - 2 z.e  (quantizer.py:38-42)
        d = (
            jnp.sum(flat ** 2, axis=1, keepdims=True)
            + jnp.sum(emb ** 2, axis=1)
            - 2.0 * jnp.dot(flat, emb.T, preferred_element_type=jnp.float32)
        )
        idx = jnp.argmin(d, axis=1)
        z_q = jnp.take(emb, idx, axis=0).reshape(z.shape)

        loss = self.beta * jnp.mean((jax.lax.stop_gradient(z_q) - z) ** 2) + jnp.mean(
            (z_q - jax.lax.stop_gradient(z)) ** 2
        )
        # straight-through (quantizer.py:58-59)
        z_st = z + jax.lax.stop_gradient(z_q - z)

        usage = jnp.zeros((self.n_embed,)).at[idx].add(1.0) / idx.shape[0]
        perplexity = jnp.exp(-jnp.sum(usage * jnp.log(usage + 1e-10)))

        return QuantizeResult(
            quantized=z_st,
            loss=loss,
            perplexity=perplexity,
            indices=idx.reshape(z.shape[:-1]),
        )

    def codebook_entry(self, indices: jnp.ndarray) -> jnp.ndarray:
        """Code ids -> embedding vectors (quantizer.py:78-91)."""
        emb = self.get_variable("params", "embedding")
        return jnp.take(emb, indices, axis=0)

    def distances(self, z: jnp.ndarray) -> jnp.ndarray:
        """Full [..., n_embed] distance matrix (quantizer.py:66-76)."""
        emb = self.get_variable("params", "embedding")
        flat = z.reshape(-1, self.embed_dim)
        d = (
            jnp.sum(flat ** 2, axis=1, keepdims=True)
            + jnp.sum(emb ** 2, axis=1)
            - 2.0 * flat @ emb.T
        )
        return d.reshape(z.shape[:-1] + (self.n_embed,))
