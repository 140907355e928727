"""NeRF sinusoidal positional encoding.

Equivalent math to the reference `Embedder` (NetWorks/utils.py:6-51) but
channels-last and expressed as one fused outer-product + trig instead of a
Python list of lambdas. The channel ordering matches the reference exactly
([x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...] interleaved per
frequency, identity first) so converted reference checkpoints line up.
"""

from __future__ import annotations

import jax.numpy as jnp


def positional_encoding(
    x: jnp.ndarray, n_freqs: int, include_input: bool = True
) -> jnp.ndarray:
    """Apply sin/cos positional encoding along the last axis.

    Args:
      x: [..., D] coordinates.
      n_freqs: number of octaves; frequencies are 2^0 .. 2^(n_freqs-1)
        (log-sampled, reference utils.py:29-32).
      include_input: prepend the identity features (reference utils.py:25-26).

    Returns:
      [..., D * (2*n_freqs + include_input)] with reference channel order:
      for each frequency f (low→high): sin(x*f) over all D dims, then
      cos(x*f) over all D dims.
    """
    freqs = 2.0 ** jnp.arange(n_freqs, dtype=x.dtype)  # [F]
    # [..., D, 1] * [F] -> [..., D, F] -> transpose to [..., F, D] so that the
    # flattened order is (freq-major, dim-minor) matching torch.cat over the
    # channel dim of [B, 3, ...] tensors.
    xf = x[..., None] * freqs  # [..., D, F]
    xf = jnp.swapaxes(xf, -1, -2)  # [..., F, D]
    sin = jnp.sin(xf)
    cos = jnp.cos(xf)
    # interleave per frequency: [sin_f, cos_f] pairs, freq-major.
    sc = jnp.stack([sin, cos], axis=-2)  # [..., F, 2, D]
    flat = sc.reshape(*x.shape[:-1], 2 * n_freqs * x.shape[-1])
    if include_input:
        flat = jnp.concatenate([x, flat], axis=-1)
    return flat
