"""Ray generation and depth sampling for the HeadNeRF volume.

Behavioral equivalent of reference `GenSamplePoints` (NetWorks/utils.py:55-161)
and `FineSample` (:164-265), re-laid-out channels-last:

  rays are `[B, N_r, 3]`, sample points `[B, N_r, N_s, 3]`.

The reference parameterizes depth by *world-space z planes* (z1=2.5,
z2=-3.5, HeadNeRFOptions.py:23-24): for each ray it computes the parameter
interval where the ray's z coordinate sweeps from z1 to z2, using
`ray_l = -1/dz` so that `o + d * l * t` has z == o_z - t. Everything here is
pure jnp with static shapes — jit/vmap/shard-friendly.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


class Rays(NamedTuple):
    """Per-ray geometry. All arrays channels-last."""

    origins: jnp.ndarray      # [B, N_r, 3]
    directions: jnp.ndarray   # [B, N_r, 3] unit-norm
    lengths: jnp.ndarray      # [B, N_r, 1]  == -1/dz (reference ray_l)


class SamplePoints(NamedTuple):
    pts: jnp.ndarray       # [B, N_r, N_s, 3] world-space sample positions
    dirs: jnp.ndarray      # [B, N_r, N_s, 3] (broadcast ray dirs)
    zvals: jnp.ndarray     # [B, N_r, N_s] parameter values (reference "zvals")
    z_dists: jnp.ndarray   # [B, N_r, N_s] inter-sample distance * ray length


def gen_rays(
    xy: jnp.ndarray,
    Rmat: jnp.ndarray,
    Tvec: jnp.ndarray,
    inv_inmat: jnp.ndarray,
) -> Rays:
    """Pixel grid -> world rays (reference utils.py:147-161).

    Args:
      xy: [B, N_r, 2] pixel coordinates.
      Rmat: [B, 3, 3] cam-to-world rotation.
      Tvec: [B, 3, 1] or [B, 3] camera origin (ray origin in world space).
      inv_inmat: [B, 3, 3] inverse intrinsics.
    """
    ones = jnp.ones(xy.shape[:-1] + (1,), dtype=xy.dtype)
    xyz = jnp.concatenate([xy, ones], axis=-1)                   # [B, N_r, 3]
    # d = R @ (K^-1 @ [x, y, 1]). Explicit broadcast-multiply-sum instead of
    # einsum: a 3-wide contraction gains nothing from the MXU, and on TPU the
    # default matmul precision is bf16 which would corrupt ray geometry.
    d = jnp.sum(inv_inmat[:, None, :, :] * xyz[:, :, None, :], axis=-1)
    d = jnp.sum(Rmat[:, None, :, :] * d[:, :, None, :], axis=-1)
    norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    d = d / norm
    # reference redefines ray_l := -1/dz after normalizing (utils.py:155)
    lengths = -1.0 / d[..., 2:3]
    o = jnp.reshape(Tvec, (Tvec.shape[0], 1, 3))
    o = jnp.broadcast_to(o, d.shape)
    return Rays(origins=o, directions=d, lengths=lengths)


def stratified_zvals(
    rays: Rays,
    n_samples: int,
    world_z1: float,
    world_z2: float,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Stratified z-plane parameter values, [B, N_r, N_s + 1].

    Mirrors reference utils.py:118-145: the parameter interval per ray is
    [o_z - z1, o_z - z2]; when `rng` is given, samples are jittered within
    strata exactly like the reference's `disturb` branch (utils.py:73-78).
    """
    oz = rays.origins[..., 2]                       # [B, N_r]
    rela_z1 = oz - world_z1
    rela_z2 = oz - world_z2
    t = jnp.linspace(0.0, 1.0, n_samples + 1, dtype=rays.origins.dtype)
    zvals = rela_z1[..., None] * (1.0 - t) + rela_z2[..., None] * t  # [B,N_r,S+1]
    if rng is not None:
        mids = 0.5 * (zvals[..., 1:] + zvals[..., :-1])
        upper = jnp.concatenate([mids, zvals[..., -1:]], axis=-1)
        lower = jnp.concatenate([zvals[..., :1], mids], axis=-1)
        u = jax.random.uniform(rng, zvals.shape, dtype=zvals.dtype)
        zvals = lower + (upper - lower) * u
    return zvals


def sample_points(rays: Rays, zvals: jnp.ndarray) -> SamplePoints:
    """Evaluate sample positions for boundary zvals [B, N_r, N_s+1]
    (reference utils.py:64-116)."""
    z_dists = (zvals[..., 1:] - zvals[..., :-1]) * rays.lengths    # [B,N_r,S]
    z = zvals[..., :-1]                                            # [B,N_r,S]
    pts = (
        rays.origins[..., None, :]
        + rays.directions[..., None, :] * rays.lengths[..., None, :] * z[..., None]
    )
    dirs = jnp.broadcast_to(rays.directions[..., None, :], pts.shape)
    return SamplePoints(pts=pts, dirs=dirs, zvals=z, z_dists=z_dists)


def fine_zvals(
    weights: jnp.ndarray,
    coarse_zvals: jnp.ndarray,
    n_fine: int,
    rng: Optional[jax.Array] = None,
) -> jnp.ndarray:
    """Hierarchical inverse-CDF importance sampling (reference utils.py:215-256).

    Args:
      weights: [B, N_r, N_c] compositing weights of the coarse pass.
      coarse_zvals: [B, N_r, N_c] coarse parameter values (post-trim).
      n_fine: number of fine samples to draw (+1 boundary convention of the
        reference: `FineSample.n_sample = num_sample_fine + 1`, utils.py:167).

    Returns:
      [B, N_r, n_fine + N_c] sorted union of coarse+fine boundary zvals,
      ready for :func:`sample_points`.
    """
    B, N_r, N_c = weights.shape
    w = jax.lax.stop_gradient(weights[..., 1:-1])                  # [B,N_r,N_c-2]
    pdf = w / jnp.sum(w + 1e-5, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)  # [B,N_r,N_c-1]

    if rng is not None:
        u = jax.random.uniform(rng, (B, N_r, n_fine), dtype=weights.dtype)
    else:
        u = jnp.linspace(0.0, 1.0, n_fine, dtype=weights.dtype)
        u = jnp.broadcast_to(u, (B, N_r, n_fine))

    # batched searchsorted(side="right") as a dense compare-and-count —
    # O(N_c * n_fine) elementwise on the VPU, no gather-heavy binary search.
    inds = jnp.sum(
        (cdf[..., None, :] <= u[..., :, None]).astype(jnp.int32), axis=-1
    )
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(N_c - 2, inds)

    bins = 0.5 * (coarse_zvals[..., 1:] + coarse_zvals[..., :-1])  # [B,N_r,N_c-1]

    cdf_b = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_a = jnp.take_along_axis(cdf, above, axis=-1)
    bin_b = jnp.take_along_axis(bins, below, axis=-1)
    bin_a = jnp.take_along_axis(bins, above, axis=-1)

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_b) / denom
    fine = bin_b + t * (bin_a - bin_b)                             # [B,N_r,n_fine]

    allz = jnp.concatenate([coarse_zvals, fine], axis=-1)
    return jnp.sort(allz, axis=-1)
