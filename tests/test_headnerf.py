"""End-to-end HeadNeRF forward tests (shapes, background identity, jit)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerf3dtalker_tpu.config import NeRFConfig
from nerf3dtalker_tpu.models import HeadNeRF
from nerf3dtalker_tpu.models.headnerf import build_code_and_cam
from nerf3dtalker_tpu.utils.camera import base_cam, ray_grid

TINY = NeRFConfig(
    featmap_size=8, featmap_nc=32, pred_img_size=32, num_sample_coarse=16,
    mlp_hidden=64,
)


def _inputs(cfg, B=1, seed=0):
    rng = np.random.default_rng(seed)
    xy, _ = ray_grid(cfg.featmap_size)
    cam = base_cam(cfg.featmap_size)
    return dict(
        batch_xy=jnp.asarray(np.tile(xy, (B, 1, 1))),
        shape_code=jnp.asarray(
            rng.standard_normal((B, cfg.shape_code_dims)).astype(np.float32) * 0.1
        ),
        appea_code=jnp.asarray(
            rng.standard_normal((B, cfg.appea_code_dims)).astype(np.float32) * 0.1
        ),
        audio_style=jnp.asarray(
            rng.standard_normal((B, cfg.audio_style_dims)).astype(np.float32) * 0.1
        ),
        Rmat=jnp.asarray(np.tile(cam.Rmat, (B, 1, 1))),
        Tvec=jnp.asarray(np.tile(cam.Tvec, (B, 1))),
        inv_inmat=jnp.asarray(np.tile(cam.inv_inmat, (B, 1, 1))),
    )


def test_forward_shapes():
    model = HeadNeRF(TINY)
    inp = _inputs(TINY, B=2)
    params = model.init(jax.random.key(0), **inp)
    out = model.apply(params, **inp)
    assert out["merge_img"].shape == (2, 32, 32, 3)
    assert out["bg_img"].shape == (1, 32, 32, 3)
    assert out["depth"].shape == (2, 8, 8)
    assert np.isfinite(np.asarray(out["merge_img"])).all()


def test_empty_volume_renders_bg():
    """If the MLP density is zero everywhere, merge_img == bg_img
    (HeadNeRFNet.py:112: merge = fg + bg_alpha * bg with bg_alpha=1,
    fg=0... fg is sigma-weighted so 0)."""
    model = HeadNeRF(TINY)
    inp = _inputs(TINY)
    params = model.init(jax.random.key(0), **inp)
    # zero the density head -> sigma = relu(0 @ w + 0) = 0
    p = params["params"]["fg_CD_predictor"]
    p["density_kernel"] = jnp.zeros_like(p["density_kernel"])
    p["density_bias"] = jnp.zeros_like(p["density_bias"])
    out = model.apply(params, **inp)
    np.testing.assert_allclose(
        np.asarray(out["merge_img"])[0], np.asarray(out["bg_img"])[0], atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(out["bg_alpha"]), 1.0, atol=1e-6)


def test_jit_and_determinism():
    model = HeadNeRF(TINY)
    inp = _inputs(TINY)
    params = model.init(jax.random.key(0), **inp)
    f = jax.jit(lambda p, i: model.apply(p, **i)["merge_img"])
    a = f(params, inp)
    b = f(params, inp)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_mode_jitter_changes_output():
    model = HeadNeRF(TINY)
    inp = _inputs(TINY)
    params = model.init(jax.random.key(0), **inp)
    a = model.apply(params, **inp, rng=jax.random.key(1))["merge_img"]
    b = model.apply(params, **inp, rng=jax.random.key(2))["merge_img"]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_audio_style_affects_render():
    model = HeadNeRF(TINY)
    inp = _inputs(TINY)
    params = model.init(jax.random.key(0), **inp)
    a = model.apply(params, **inp)["merge_img"]
    inp2 = dict(inp)
    inp2["audio_style"] = inp["audio_style"] + 1.0
    b = model.apply(params, **inp2)["merge_img"]
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_build_code_and_cam_overwrite():
    """audio exp overwrites expr[:64] (talker_trainer.py:853)."""
    B = 2
    iden = jnp.zeros((B, 100))
    expr = jnp.ones((B, 79))
    text = jnp.zeros((B, 100))
    illu = jnp.zeros((B, 27))
    aud = jnp.full((B, 64), 5.0)
    shape, appea = build_code_and_cam(iden, expr, text, illu, aud)
    assert shape.shape == (B, 179) and appea.shape == (B, 127)
    np.testing.assert_allclose(np.asarray(shape)[:, 100:164], 5.0)
    np.testing.assert_allclose(np.asarray(shape)[:, 164:], 1.0)


def test_hier_sampling_path():
    cfg = dataclasses.replace(TINY, hier_sampling=True, num_sample_fine=8)
    model = HeadNeRF(cfg)
    inp = _inputs(cfg)
    params = model.init(jax.random.key(0), **inp)
    out = model.apply(params, **inp)
    assert out["fine_merge_img"].shape == (1, 32, 32, 3)
    assert np.isfinite(np.asarray(out["fine_merge_img"])).all()


def test_include_vd_path():
    cfg = dataclasses.replace(TINY, include_vd=True)
    model = HeadNeRF(cfg)
    inp = _inputs(cfg)
    params = model.init(jax.random.key(0), **inp)
    out = model.apply(params, **inp)
    assert out["merge_img"].shape == (1, 32, 32, 3)
