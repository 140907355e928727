"""NeRF sinusoidal positional encoding.

Equivalent math to the reference `Embedder` (NetWorks/utils.py:6-51) but
channels-last and expressed as one fused outer-product + trig instead of a
Python list of lambdas. The channel ordering matches the reference exactly
([x, sin(2^0 x), cos(2^0 x), sin(2^1 x), cos(2^1 x), ...] interleaved per
frequency, identity first) so converted reference checkpoints line up.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


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


@functools.lru_cache(maxsize=None)
def _pe_matrix(n_freqs: int, dim: int, include_input: bool, pad_to: int):
    """Projection matrix + column-kind vector for matmul-form PE.

    Returns (G [dim, K], kind [K]) such that, for z = x @ G,
      out[:, k] = z[:, k]      where kind[k] == 0  (identity / zero-pad cols)
                  sin(z[:, k]) where kind[k] == 1
                  cos(z[:, k]) where kind[k] == 2
    reproduces :func:`positional_encoding`'s channel order exactly (each
    column has a single nonzero power-of-two entry, so the contraction is
    bit-exact in f32).
    """
    cols, kind = [], []

    def col(d, scale, k):
        e = np.zeros((dim,), np.float32)
        e[d] = scale
        cols.append(e)
        kind.append(k)

    if include_input:
        for d in range(dim):
            col(d, 1.0, 0)
    for f in range(n_freqs):
        for trig_kind in (1, 2):  # sin block then cos block, dim-minor
            for d in range(dim):
                col(d, float(2.0 ** f), trig_kind)
    while len(cols) < pad_to:  # zero-pad columns: z == 0, kind 0 -> out 0
        cols.append(np.zeros((dim,), np.float32))
        kind.append(0)
    G = np.stack(cols, axis=1)
    return G, np.asarray(kind, np.int32)


def positional_encoding_rays(
    origins: jnp.ndarray,      # [B, N_r, 3]
    directions: jnp.ndarray,   # [B, N_r, 3]
    lengths: jnp.ndarray,      # [B, N_r, 1]
    zvals: jnp.ndarray,        # [B, N_r, N_s] (post-trim sample parameters)
    n_freqs: int,
    include_input: bool = True,
    pad_to: int = 0,
) -> jnp.ndarray:
    """Layout-friendly PE over ray sample points, [B, N_r, N_s, K].

    Equivalent to ``pad(positional_encoding(sample_points(...).pts))`` but
    TPU-shaped: the naive form materializes [..., 3]/[..., F, 3] arrays whose
    minor dim pads 3 -> 128 lanes (a ~40x HBM blowup, ~1.2 GB/step at Reso64).
    Here points are built channel-first [B, 3, N] (N in lanes), projected by a
    single tiny matmul onto the K output columns (landing directly in the
    kernel's [N, K] layout), and finished with one fused sin/cos select.
    The matmul contracts power-of-two single-entry columns at HIGHEST
    precision, so results are bit-identical to the reference path.
    """
    B, n_rays, _ = origins.shape
    n_s = zvals.shape[-1]
    k_out = 3 * (2 * n_freqs + int(include_input))
    k_pad = max(pad_to, k_out)
    # pts[c] = o[c] + (d[c] * l) * z  — same op order as ops.rays.sample_points
    o_cf = jnp.swapaxes(origins, -1, -2)                    # [B, 3, N_r]
    d_cf = jnp.swapaxes(directions * lengths, -1, -2)       # [B, 3, N_r]
    pts = o_cf[..., None] + d_cf[..., None] * zvals[:, None]  # [B, 3, N_r, N_s]
    pts = pts.reshape(B, 3, n_rays * n_s)
    G, kind = _pe_matrix(n_freqs, 3, include_input, k_pad)
    z = jnp.einsum(
        "bdn,dk->bnk", pts, jnp.asarray(G),
        precision=jax.lax.Precision.HIGHEST,
    )
    kind = jnp.asarray(kind)
    out = jnp.where(kind == 1, jnp.sin(z), jnp.where(kind == 2, jnp.cos(z), z))
    return out.reshape(B, n_rays, n_s, k_pad)
