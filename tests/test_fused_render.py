"""Fused Pallas render kernel: parity vs the jnp oracle and vs the flax
model path, plus gradient flow through the custom_vjp (interpret mode on
CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf3dtalker_tpu.config import reso64
from nerf3dtalker_tpu.models import HeadNeRF
from nerf3dtalker_tpu.models.nerf_mlp import NeRFMLP
from nerf3dtalker_tpu.ops.pallas.fused_render import (
    NS,
    PE_PAD,
    fused_render,
    fused_render_fwd,
    pack_weights,
    reference_render,
)
from nerf3dtalker_tpu.utils.camera import base_cam, ray_grid

CFG = reso64()


def _setup(B=1, R=128, seed=0):
    rng = np.random.default_rng(seed)
    mlp = NeRFMLP(
        vp_channels=CFG.vp_channels, vd_channels=CFG.vd_channels,
        hidden=384, out_features=256,
    )
    pe_probe = jnp.asarray(rng.standard_normal((1, 4, 4, 63)).astype(np.float32))
    shape = jnp.asarray(rng.standard_normal((B, 179)).astype(np.float32) * 0.1)
    appea = jnp.asarray(rng.standard_normal((B, 127)).astype(np.float32) * 0.1)
    aud = jnp.asarray(rng.standard_normal((B, 64)).astype(np.float32) * 0.1)
    params = mlp.init(jax.random.key(0), pe_probe, shape[:1], appea[:1], aud[:1])
    packed = pack_weights(params["params"], shape, appea, aud)

    pe = rng.standard_normal((B, R, NS, PE_PAD)).astype(np.float32)
    pe[..., 63:] = 0.0
    zd = np.abs(rng.standard_normal((B, R, NS))).astype(np.float32) * 0.1
    zv = np.sort(rng.standard_normal((B, R, NS)), axis=-1).astype(np.float32)
    return mlp, params, packed, jnp.asarray(pe), jnp.asarray(zd), jnp.asarray(zv), (shape, appea, aud)


def test_kernel_matches_oracle():
    _, _, packed, pe, zd, zv, _ = _setup(B=2, R=128)
    ref = reference_render(pe, zd, zv, packed)
    out = fused_render_fwd(
        pe, zd, zv, packed, tile_rays=64, compute_dtype=jnp.float32,
        interpret=True,
    )
    for name, a, b in zip(("feat", "bg", "depth"), out, ref):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-5, err_msg=name
        )


def test_oracle_matches_model_path():
    """The packed-weight oracle must agree with the NeRFMLP+composite
    flax path (per-batch code folding correctness)."""
    from nerf3dtalker_tpu.ops.compositing import alpha_composite

    mlp, params, packed, pe, zd, zv, (shape, appea, aud) = _setup(B=2, R=64)
    feat, dens = mlp.apply(params, pe[..., :63], shape, appea, aud)
    comp = alpha_composite(feat, dens[..., 0], zd, zv)
    ref = reference_render(pe, zd, zv, packed)
    np.testing.assert_allclose(
        np.asarray(comp.features), np.asarray(ref[0]), rtol=2e-3, atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(comp.bg_alpha), np.asarray(ref[1]), rtol=1e-4, atol=1e-5
    )


def test_gradients_flow_through_custom_vjp():
    _, _, packed, pe, zd, zv, _ = _setup(B=1, R=64)

    def loss(w, p):
        f, bg, d = fused_render(p, zd, zv, w, 64, jnp.float32, True)
        return jnp.mean(f ** 2) + jnp.mean(bg ** 2)

    g_w, g_pe = jax.grad(loss, argnums=(0, 1))(packed, pe)
    for k, v in g_w.items():
        assert np.isfinite(np.asarray(v)).all(), k
    # every weight (except padding rows) gets signal
    for k in ("w0p", "wh", "w5x", "wr0", "wr1", "wr2", "b0", "br2"):
        assert float(jnp.linalg.norm(g_w[k])) > 0, k
    assert float(jnp.linalg.norm(g_pe)) > 0
    # padded PE rows receive zero grad
    np.testing.assert_allclose(np.asarray(g_pe[..., 63:]), 0.0, atol=1e-7)

    # grads match the oracle's
    def loss_ref(w, p):
        f, bg, d = reference_render(p, zd, zv, w)
        return jnp.mean(f ** 2) + jnp.mean(bg ** 2)

    g_w2, g_pe2 = jax.grad(loss_ref, argnums=(0, 1))(packed, pe)
    np.testing.assert_allclose(
        np.asarray(g_pe), np.asarray(g_pe2), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(g_w["wh"]), np.asarray(g_w2["wh"]), rtol=1e-5, atol=1e-6
    )


def test_batched_gradients_match_oracle():
    """B>1 exercises the [B, 8, X] sublane-padded per-batch bias blocks
    (b0/b5/br1 rows and their row-0 grad accumulators)."""
    _, _, packed, pe, zd, zv, _ = _setup(B=2, R=32, seed=1)

    def loss(w, p):
        f, bg, d = fused_render(p, zd, zv, w, 16, jnp.float32, True)
        return jnp.mean(f ** 2) + jnp.mean(bg ** 2) + jnp.mean(d ** 2)

    def loss_ref(w, p):
        f, bg, d = reference_render(p, zd, zv, w)
        return jnp.mean(f ** 2) + jnp.mean(bg ** 2) + jnp.mean(d ** 2)

    g_w, g_pe = jax.grad(loss, argnums=(0, 1))(packed, pe)
    g_w2, g_pe2 = jax.grad(loss_ref, argnums=(0, 1))(packed, pe)
    np.testing.assert_allclose(
        np.asarray(g_pe), np.asarray(g_pe2), rtol=1e-5, atol=1e-6
    )
    for k in g_w:
        np.testing.assert_allclose(
            np.asarray(g_w[k]), np.asarray(g_w2[k]),
            rtol=1e-5, atol=1e-6, err_msg=k,
        )
    # the two batch rows of the per-batch bias grads must differ (distinct
    # codes -> distinct conditioning)
    for k in ("b0", "b5", "br1"):
        assert float(jnp.linalg.norm(g_w[k][0] - g_w[k][1])) > 0, k


def test_input_grads_false_matches_weight_grads():
    """input_grads=False (train-step mode) must leave weight grads
    identical and return hard-zero pe cotangents."""
    _, _, packed, pe, zd, zv, _ = _setup(B=2, R=32, seed=3)

    def loss(w, p, ig):
        f, bg, d = fused_render(p, zd, zv, w, 16, jnp.float32, True, ig)
        return jnp.mean(f ** 2) + jnp.mean(bg ** 2)

    gw1, gp1 = jax.grad(lambda w, p: loss(w, p, True), (0, 1))(packed, pe)
    gw0, gp0 = jax.grad(lambda w, p: loss(w, p, False), (0, 1))(packed, pe)
    for k in gw1:
        np.testing.assert_allclose(
            np.asarray(gw0[k]), np.asarray(gw1[k]),
            rtol=1e-6, atol=1e-7, err_msg=k,
        )
    assert float(jnp.linalg.norm(gp0)) == 0.0
    assert float(jnp.linalg.norm(gp1)) > 0


def test_headnerf_fused_matches_standard():
    """Full model forward: fused path vs standard path at Reso64 shapes
    (small ray count via smaller featmap is impossible — kernel needs the
    flagship dims — so run 64x64 rays on CPU interpret; slowish but small)."""
    import dataclasses

    cfg = CFG
    model_std = HeadNeRF(cfg)
    model_fused = HeadNeRF(cfg, use_fused=True, fused_interpret=True)

    rng = np.random.default_rng(0)
    xy, _ = ray_grid(cfg.featmap_size)
    cam = base_cam(cfg.featmap_size)
    inp = dict(
        batch_xy=jnp.asarray(xy),
        shape_code=jnp.asarray(rng.standard_normal((1, 179)).astype(np.float32) * 0.1),
        appea_code=jnp.asarray(rng.standard_normal((1, 127)).astype(np.float32) * 0.1),
        audio_style=jnp.asarray(rng.standard_normal((1, 64)).astype(np.float32) * 0.1),
        Rmat=jnp.asarray(cam.Rmat),
        Tvec=jnp.asarray(cam.Tvec),
        inv_inmat=jnp.asarray(cam.inv_inmat),
    )
    params = model_std.init(jax.random.key(0), **inp)
    a = model_std.apply(params, **inp)["merge_img"]
    b = model_fused.apply(params, **inp)["merge_img"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)
