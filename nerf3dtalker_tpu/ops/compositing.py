"""Volume-rendering alpha compositing.

Equivalent of reference `CalcRayColor` (NetWorks/utils.py:268-308),
channels-last: features `[B, N_r, N_s, C]`, densities/dists `[B, N_r, N_s]`.
The transmittance cumulative product runs over the (innermost-but-one)
samples axis; XLA fuses the whole thing into the surrounding computation.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class CompositeResult(NamedTuple):
    features: jnp.ndarray   # [B, N_r, C]   fg feature (Σ w_i f_i)
    bg_alpha: jnp.ndarray   # [B, N_r]      1 - Σ w_i
    depth: jnp.ndarray      # [B, N_r]      Σ w_i z_i
    weights: jnp.ndarray    # [B, N_r, N_s]


def alpha_composite(
    features: jnp.ndarray,
    density: jnp.ndarray,
    z_dists: jnp.ndarray,
    zvals: jnp.ndarray,
) -> CompositeResult:
    """α-composite per-sample features along each ray.

    α_i = 1 - exp(-σ_i δ_i); T_i = Π_{j<i}(1-α_j+1e-10); w_i = α_i T_i
    (reference utils.py:272-289, incl. the 1e-10 stabilizer inside the
    cumulative product).
    """
    alpha = 1.0 - jnp.exp(-density * z_dists)                 # [B,N_r,N_s]
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    # exclusive cumprod with leading 1 (reference pads with 1.0, utils.py:284)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1
    )
    weights = alpha * trans                                   # [B,N_r,N_s]

    # full-precision accumulation: the weights sum to ~1 and feature parity
    # with the fp32 reference is a correctness target (BASELINE.md), so do
    # not let TPU's default-bf16 matmul path touch this contraction.
    feat = jnp.einsum(
        "brs,brsc->brc",
        weights,
        features,
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )
    depth = jnp.sum(weights * zvals, axis=-1)
    acc = jnp.sum(weights, axis=-1)
    return CompositeResult(
        features=feat, bg_alpha=1.0 - acc, depth=depth, weights=weights
    )
