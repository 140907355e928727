"""Phase-stacked upsampler parity: phase_renderer (jnp) and the fused
Pallas kernels (interpret mode) vs the NeuralRenderer flax module."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf3dtalker_tpu.models.neural_renderer import NeuralRenderer
from nerf3dtalker_tpu.models.phase_renderer import (
    extract_phase_params,
    phase_renderer_forward,
    stack_phases,
    unstack_phases,
)
from nerf3dtalker_tpu.ops.pallas.fused_upsampler import fused_upsampler


def _make_renderer(featmap=8, img=64, feat_nc=32, min_feat=8, seed=0):
    nr = NeuralRenderer(
        feat_nc=feat_nc, out_dim=3, final_actvn=True, min_feat=min_feat,
        featmap_size=featmap, img_size=img, bg_type="white",
    )
    x = jnp.asarray(
        np.random.default_rng(seed).standard_normal((2, featmap, featmap, feat_nc)),
        jnp.float32,
    )
    params = nr.init(jax.random.key(seed), x)
    return nr, params, x


def test_stack_unstack_roundtrip():
    rng = np.random.default_rng(3)
    img = jnp.asarray(rng.standard_normal((16, 16, 5)), jnp.float32)
    st = stack_phases(img, 2)
    assert st.shape == (4, 4, 4, 4, 5)
    np.testing.assert_array_equal(np.asarray(unstack_phases(st)), np.asarray(img))


@pytest.mark.parametrize("featmap,img", [(8, 32), (8, 64)])
def test_phase_renderer_matches_module(featmap, img):
    nr, params, x = _make_renderer(featmap, img)
    want = np.asarray(nr.apply(params, x))
    n_blocks = int(np.log2(img // featmap))
    pp = extract_phase_params(params, n_blocks)
    got = np.stack([
        np.asarray(phase_renderer_forward(x[b], pp, n_blocks))
        for b in range(x.shape[0])
    ])
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_phase_renderer_grads_match_module():
    nr, params, x = _make_renderer(8, 32)
    n_blocks = 2
    pp = extract_phase_params(params, n_blocks)

    def loss_mod(p):
        return jnp.sum(nr.apply(p, x) ** 2)

    def loss_phase(pp_):
        img = jax.vmap(lambda xb: phase_renderer_forward(xb, pp_, n_blocks))(x)
        return jnp.sum(img ** 2)

    g_mod = jax.grad(loss_mod)(params)["params"]
    g_phase = jax.grad(loss_phase)(pp)
    # spot-check a Dense kernel that needs no permutation
    np.testing.assert_allclose(
        np.asarray(g_phase["wf_0"]),
        np.asarray(g_mod["feat_layer_0"]["kernel"]), rtol=2e-4, atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(g_phase["wr_0"]),
        np.asarray(g_mod["feat_2_rgb_0"]["kernel"]), rtol=2e-4, atol=2e-5,
    )


@pytest.mark.parametrize("strips", [(8, 8, 8), (4, 4, 2)])
def test_fused_upsampler_interpret_matches_module(strips):
    """Single-strip and multi-strip (halo) paths, interpret mode on CPU."""
    nr, params, x = _make_renderer(8, 64)
    n_blocks = 3
    want = np.asarray(nr.apply(params, x))
    pp = extract_phase_params(params, n_blocks)
    got = np.asarray(
        fused_upsampler(x, pp, n_blocks, compute_dtype=jnp.float32,
                        strip_rows=strips, interpret=True)
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_headnerf_fused_upsampler_path():
    """HeadNeRF with use_fused_upsampler matches the standard decoder,
    values and parameter grads (interpret mode on CPU, tiny config)."""
    from nerf3dtalker_tpu.config import NeRFConfig
    from nerf3dtalker_tpu.models import HeadNeRF
    from nerf3dtalker_tpu.utils.camera import base_cam, ray_grid

    cfg = NeRFConfig(featmap_size=8, featmap_nc=32, pred_img_size=32,
                     num_sample_coarse=8, mlp_hidden=32)
    rng = np.random.default_rng(0)
    xy, _ = ray_grid(cfg.featmap_size)
    cam = base_cam(cfg.featmap_size)
    f32 = np.float32
    inp = dict(
        batch_xy=jnp.asarray(xy),
        shape_code=jnp.asarray(rng.standard_normal((1, 179)).astype(f32) * 0.1),
        appea_code=jnp.asarray(rng.standard_normal((1, 127)).astype(f32) * 0.1),
        audio_style=jnp.asarray(rng.standard_normal((1, 64)).astype(f32) * 0.1),
        Rmat=jnp.asarray(cam.Rmat),
        Tvec=jnp.asarray(cam.Tvec),
        inv_inmat=jnp.asarray(cam.inv_inmat),
    )
    m_std = HeadNeRF(cfg)
    m_fup = HeadNeRF(cfg, use_fused_upsampler=True, fused_interpret=True)
    params = m_std.init(jax.random.key(0), **inp)

    out_std = m_std.apply(params, **inp)
    out_fup = m_fup.apply(params, **inp)
    np.testing.assert_allclose(
        np.asarray(out_fup["merge_img"]), np.asarray(out_std["merge_img"]),
        rtol=1e-4, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out_fup["bg_img"]), np.asarray(out_std["bg_img"]),
        rtol=1e-4, atol=1e-4,
    )

    target = jnp.full((1, cfg.pred_img_size, cfg.pred_img_size, 3), 0.4)

    def loss(model, p):
        out = model.apply(p, **inp)
        return (jnp.mean((out["merge_img"] - target) ** 2)
                + jnp.mean((out["bg_img"] - 1.0) ** 2))

    g_std = jax.grad(lambda p: loss(m_std, p))(params)
    g_fup = jax.grad(lambda p: loss(m_fup, p))(params)
    for (k, v1), (_, v2) in zip(
        jax.tree_util.tree_flatten_with_path(g_std)[0],
        jax.tree_util.tree_flatten_with_path(g_fup)[0],
    ):
        n1, n2 = float(jnp.linalg.norm(v1)), float(jnp.linalg.norm(v2))
        assert abs(n1 - n2) <= 1e-3 * max(n1, n2, 1e-6), \
            (jax.tree_util.keystr(k), n1, n2)


def test_fused_upsampler_bf16_backward_compiles():
    """bf16 compute path: backward dtype plumbing (grad windows are f32,
    vjp cotangents bf16) — values only need loose agreement."""
    nr, params, x = _make_renderer(8, 32)
    n_blocks = 2
    pp = extract_phase_params(params, n_blocks)

    def loss_fused(pp_, x_):
        img = fused_upsampler(x_, pp_, n_blocks, compute_dtype=jnp.bfloat16,
                              strip_rows=(4, 4), interpret=True)
        return jnp.sum(img ** 2)

    gp, gx = jax.grad(loss_fused, argnums=(0, 1))(pp, x)
    assert np.isfinite(np.asarray(gx)).all()
    for k, v in gp.items():
        assert np.isfinite(np.asarray(v)).all(), k


def test_fused_upsampler_backward_interpret():
    nr, params, x = _make_renderer(8, 32)
    n_blocks = 2
    pp = extract_phase_params(params, n_blocks)

    def loss_fused(pp_, x_):
        img = fused_upsampler(x_, pp_, n_blocks, compute_dtype=jnp.float32,
                              strip_rows=(4, 4), interpret=True)
        return jnp.sum(img ** 2)

    def loss_ref(pp_, x_):
        img = jax.vmap(lambda xb: phase_renderer_forward(xb, pp_, n_blocks))(x_)
        return jnp.sum(img ** 2)

    (gp, gx) = jax.grad(loss_fused, argnums=(0, 1))(pp, x)
    (gp_ref, gx_ref) = jax.grad(loss_ref, argnums=(0, 1))(pp, x)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gx_ref),
                               rtol=1e-4, atol=1e-4)
    for k in gp_ref:
        np.testing.assert_allclose(
            np.asarray(gp[k]), np.asarray(gp_ref[k]), rtol=1e-4, atol=1e-4,
            err_msg=k,
        )
