"""Unit tests for ray generation, positional encoding, and compositing.

Oracles are independent torch/numpy re-derivations of the documented math
(cited to reference file:line in the op docstrings) — not reference code.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from nerf3dtalker_tpu.ops import (
    alpha_composite,
    fine_zvals,
    gen_rays,
    positional_encoding,
    sample_points,
    stratified_zvals,
)
from nerf3dtalker_tpu.utils.camera import base_cam, ray_grid


def test_positional_encoding_matches_torch_order():
    """Channel order must be [x, sin(2^0 x), cos(2^0 x), sin(2^1 x), ...]
    per-dim blocks (reference Embedder, NetWorks/utils.py:25-49)."""
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 5, 7, 3)).astype(np.float32)

    got = np.asarray(positional_encoding(jnp.asarray(x), n_freqs=10))
    assert got.shape == (2, 5, 7, 63)

    xt = torch.from_numpy(x)
    feats = [xt]
    for f in 2.0 ** torch.arange(10):
        feats.append(torch.sin(xt * f))
        feats.append(torch.cos(xt * f))
    want = torch.cat(feats, dim=-1).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)


def test_positional_encoding_rays_matches_reference_path():
    """The matmul-form PE (TPU layout-friendly) must reproduce
    pad(positional_encoding(sample_points(...).pts)) exactly."""
    from nerf3dtalker_tpu.ops.embedding import positional_encoding_rays

    xy, _ = ray_grid(8)
    cam = base_cam(8)
    B = 2
    rays = gen_rays(
        jnp.asarray(np.tile(xy, (B, 1, 1))),
        jnp.asarray(np.tile(cam.Rmat, (B, 1, 1))),
        jnp.asarray(np.tile(cam.Tvec, (B, 1))),
        jnp.asarray(np.tile(cam.inv_inmat, (B, 1, 1))),
    )
    zb = stratified_zvals(rays, 16, 2.5, -3.5, jax.random.key(3))
    sp = sample_points(rays, zb)

    want = positional_encoding(sp.pts, n_freqs=10)
    want = jnp.pad(want, ((0, 0), (0, 0), (0, 0), (0, 64 - want.shape[-1])))
    got = positional_encoding_rays(
        rays.origins, rays.directions, rays.lengths, sp.zvals,
        n_freqs=10, pad_to=64,
    )
    assert got.shape == want.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=0, atol=1e-6)


def test_gen_rays_geometry():
    """ray_d = R K^-1 [x,y,1] normalized; ray_l = -1/dz
    (NetWorks/utils.py:147-161)."""
    xy, _ = ray_grid(8)
    cam = base_cam(8)
    rays = gen_rays(
        jnp.asarray(xy), jnp.asarray(cam.Rmat), jnp.asarray(cam.Tvec),
        jnp.asarray(cam.inv_inmat),
    )
    d = np.asarray(rays.directions)
    np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)

    # oracle for one pixel
    x, y = xy[0, 11]
    v = cam.inv_inmat[0] @ np.array([x, y, 1.0])
    v = cam.Rmat[0] @ v
    v = v / np.linalg.norm(v)
    np.testing.assert_allclose(d[0, 11], v, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(rays.lengths)[0, 11, 0], -1.0 / v[2], rtol=1e-5
    )


def test_sample_points_z_planes():
    """Deterministic stratified samples sweep z from o_z - z1 to o_z - z2;
    world-space z of sample k must hit the planes at the ends
    (NetWorks/utils.py:125-145: zvals are o_z-relative)."""
    xy, _ = ray_grid(8)
    cam = base_cam(8)
    rays = gen_rays(
        jnp.asarray(xy), jnp.asarray(cam.Rmat), jnp.asarray(cam.Tvec),
        jnp.asarray(cam.inv_inmat),
    )
    zb = stratified_zvals(rays, 64, world_z1=2.5, world_z2=-3.5, rng=None)
    sp = sample_points(rays, zb)
    pts = np.asarray(sp.pts)   # [1, 64rays, 64samples, 3]
    # first sample of each ray lies on world z = 2.5 plane:
    # z(sample) = o_z + dz * l * zval, with l = -1/dz -> z = o_z - zval,
    # zval[0] = o_z - 2.5 -> z = 2.5.
    np.testing.assert_allclose(pts[..., 0, 2], 2.5, atol=1e-4)
    # z decreases monotonically toward (but not reaching) -3.5
    assert np.all(np.diff(pts[..., 2], axis=-1) < 0)
    assert np.all(pts[..., -1, 2] > -3.5)

    # z_dists = diff(zvals) * ray_l
    zd = np.asarray(sp.z_dists)
    want = np.diff(np.asarray(zb), axis=-1) * np.asarray(rays.lengths)
    np.testing.assert_allclose(zd, want, rtol=1e-5)


def test_stratified_jitter_stays_in_strata():
    xy, _ = ray_grid(4)
    cam = base_cam(4)
    rays = gen_rays(
        jnp.asarray(xy), jnp.asarray(cam.Rmat), jnp.asarray(cam.Tvec),
        jnp.asarray(cam.inv_inmat),
    )
    det = np.asarray(stratified_zvals(rays, 16, 2.5, -3.5, rng=None))
    jit = np.asarray(stratified_zvals(rays, 16, 2.5, -3.5, rng=jax.random.key(0)))
    assert jit.shape == det.shape
    # each jittered value lies within [lower, upper] midpoints bracket
    mids = 0.5 * (det[..., 1:] + det[..., :-1])
    upper = np.concatenate([mids, det[..., -1:]], axis=-1)
    lower = np.concatenate([det[..., :1], mids], axis=-1)
    assert np.all(jit >= lower - 1e-6) and np.all(jit <= upper + 1e-6)


def test_alpha_composite_against_torch():
    """w_i = alpha_i * cumprod([1, 1-alpha+1e-10])_i (utils.py:272-289)."""
    rng = np.random.default_rng(1)
    feat = rng.standard_normal((2, 16, 8, 5)).astype(np.float32)
    sigma = np.abs(rng.standard_normal((2, 16, 8))).astype(np.float32)
    dists = np.abs(rng.standard_normal((2, 16, 8))).astype(np.float32) * 0.1
    zvals = np.sort(rng.standard_normal((2, 16, 8)), axis=-1).astype(np.float32)

    res = alpha_composite(
        jnp.asarray(feat), jnp.asarray(sigma), jnp.asarray(dists), jnp.asarray(zvals)
    )

    a = 1.0 - torch.exp(-torch.from_numpy(sigma) * torch.from_numpy(dists))
    x = 1.0 - a + 1e-10
    x = torch.cat([torch.ones_like(x[..., :1]), x], dim=-1)
    w = a * torch.cumprod(x, dim=-1)[..., :-1]
    np.testing.assert_allclose(np.asarray(res.weights), w.numpy(), rtol=1e-5, atol=1e-6)
    want_feat = torch.einsum("brs,brsc->brc", w, torch.from_numpy(feat)).numpy()
    np.testing.assert_allclose(np.asarray(res.features), want_feat, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(res.bg_alpha), (1 - w.sum(-1)).numpy(), rtol=1e-4, atol=1e-5
    )


def test_alpha_composite_opaque_and_empty():
    # empty volume -> bg_alpha 1, zero features
    feat = jnp.ones((1, 4, 8, 3))
    zeros = jnp.zeros((1, 4, 8))
    res = alpha_composite(feat, zeros, jnp.ones((1, 4, 8)), zeros)
    np.testing.assert_allclose(np.asarray(res.bg_alpha), 1.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(res.features), 0.0, atol=1e-6)
    # opaque first sample -> weight 1 on it
    sigma = jnp.zeros((1, 4, 8)).at[..., 0].set(1e6)
    res = alpha_composite(feat, sigma, jnp.ones((1, 4, 8)), zeros)
    np.testing.assert_allclose(np.asarray(res.weights)[..., 0], 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(res.bg_alpha), 0.0, atol=1e-5)


def test_fine_zvals_importance_concentration():
    """Inverse-CDF sampling should concentrate fine samples where coarse
    weights are large (utils.py:215-256)."""
    B, N_r, N_c = 1, 4, 16
    zc = np.tile(np.linspace(0.0, 1.0, N_c, dtype=np.float32), (B, N_r, 1))
    w = np.full((B, N_r, N_c), 1e-4, dtype=np.float32)
    w[..., 8] = 1.0  # all mass near z ~ 0.53
    out = np.asarray(
        fine_zvals(jnp.asarray(w), jnp.asarray(zc), n_fine=32, rng=None)
    )
    assert out.shape == (B, N_r, 32 + N_c)
    assert np.all(np.diff(out, axis=-1) >= 0)  # sorted
    fine_only = out[..., :]  # union; check concentration via median distance
    med = np.median(fine_only, axis=-1)
    np.testing.assert_allclose(med, 0.53, atol=0.06)


def test_fine_zvals_uniform_weights_cover_range():
    B, N_r, N_c = 1, 3, 16
    zc = np.tile(np.linspace(0.0, 1.0, N_c, dtype=np.float32), (B, N_r, 1))
    w = np.ones((B, N_r, N_c), dtype=np.float32)
    out = np.asarray(fine_zvals(jnp.asarray(w), jnp.asarray(zc), 64, rng=jax.random.key(3)))
    assert out.min() >= -1e-6 and out.max() <= 1.0 + 1e-6
    # roughly uniform: quartiles near 0.25/0.5/0.75
    q = np.quantile(out, [0.25, 0.5, 0.75])
    np.testing.assert_allclose(q, [0.25, 0.5, 0.75], atol=0.08)
