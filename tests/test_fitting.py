"""Fitting driver: recover latent offsets of a rendered target, novel-view
and morphing renders, rotation utils."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf3dtalker_tpu.config import NeRFConfig
from nerf3dtalker_tpu.models import HeadNeRF
from nerf3dtalker_tpu.train.fitting import (
    fit_single_image,
    init_fit_vars,
    render_morphing,
    render_novel_views,
)
from nerf3dtalker_tpu.utils.camera import base_cam, ray_grid
from nerf3dtalker_tpu.utils.rotations import (
    d6_to_rmat,
    euler_to_rmat,
    gaze_to_d6,
    quat_to_rmat,
    rmat_to_d6,
)

TINY = NeRFConfig(
    featmap_size=8, featmap_nc=32, pred_img_size=32, num_sample_coarse=8,
    mlp_hidden=32,
)


def _model_and_target(seed=0):
    rng = np.random.default_rng(seed)
    model = HeadNeRF(TINY)
    xy, _ = ray_grid(TINY.featmap_size)
    cam = base_cam(TINY.featmap_size)
    codes = {
        "iden": jnp.asarray(rng.standard_normal((1, 100)).astype(np.float32) * 0.1),
        "expr": jnp.asarray(rng.standard_normal((1, 79)).astype(np.float32) * 0.1),
        "text": jnp.asarray(rng.standard_normal((1, 100)).astype(np.float32) * 0.1),
        "illu": jnp.asarray(rng.standard_normal((1, 27)).astype(np.float32) * 0.1),
    }
    aud = jnp.asarray(rng.standard_normal((1, 64)).astype(np.float32) * 0.1)
    shape = jnp.concatenate([codes["iden"], codes["expr"]], -1)
    appea = jnp.concatenate([codes["text"], codes["illu"]], -1)
    caminfo = {
        "Rmat": jnp.asarray(cam.Rmat), "Tvec": jnp.asarray(cam.Tvec),
        "inv_inmat": jnp.asarray(cam.inv_inmat),
    }
    inp = dict(
        batch_xy=jnp.asarray(xy), shape_code=shape, appea_code=appea,
        audio_style=aud, Rmat=caminfo["Rmat"], Tvec=caminfo["Tvec"],
        inv_inmat=caminfo["inv_inmat"],
    )
    params = model.init(jax.random.key(0), **inp)
    target = model.apply(params, **inp)["merge_img"]
    return model, params, codes, caminfo, aud, target


def test_fitting_reduces_loss():
    model, params, codes, caminfo, aud, target = _model_and_target()
    # perturb base codes -> fitting must reduce the head loss on the target
    bad = dict(codes)
    bad["iden"] = codes["iden"] + 0.3
    mask = jnp.ones_like(target[..., :1])

    fit, losses = fit_single_image(
        model, params, target, mask, bad, caminfo, aud,
        iters=40, init_lr=0.02, opt_cam=False,
    )
    fit0_losses = fit_single_image(
        model, params, target, mask, bad, caminfo, aud,
        iters=1, init_lr=0.0, opt_cam=False,
    )[1]
    assert losses["head_loss"] < fit0_losses["head_loss"]
    # offsets moved toward -0.3 on iden
    assert float(jnp.mean(fit.iden_offset)) < 0.0


def test_novel_views_and_morphing():
    model, params, codes, caminfo, aud, _ = _model_and_target()
    shape = jnp.concatenate([codes["iden"], codes["expr"]], -1)
    appea = jnp.concatenate([codes["text"], codes["illu"]], -1)
    views = render_novel_views(model, params, shape, appea, aud, view_num=3)
    assert views.shape == (3, 32, 32, 3)
    assert np.isfinite(views).all()

    from nerf3dtalker_tpu.utils.camera import base_cam

    morphs = render_morphing(
        model, params, shape, shape + 0.5, appea, aud,
        base_cam(TINY.featmap_size), steps=3,
    )
    assert morphs.shape == (3, 32, 32, 3)
    assert not np.allclose(morphs[0], morphs[-1])


def test_rotation_utils():
    # euler zero -> identity
    np.testing.assert_allclose(
        np.asarray(euler_to_rmat(jnp.zeros((1, 3)))[0]), np.eye(3), atol=1e-6
    )
    # rotations are orthonormal
    R = euler_to_rmat(jnp.asarray([[0.3, -0.2, 0.5]]))[0]
    np.testing.assert_allclose(np.asarray(R @ R.T), np.eye(3), atol=1e-6)
    assert abs(float(jnp.linalg.det(R)) - 1.0) < 1e-6

    # quat identity
    np.testing.assert_allclose(
        np.asarray(quat_to_rmat(jnp.asarray([[1.0, 0, 0, 0]]))[0]), np.eye(3),
        atol=1e-6,
    )
    # d6 roundtrip
    d6 = rmat_to_d6(R[None])
    R2 = d6_to_rmat(d6)[0]
    np.testing.assert_allclose(np.asarray(R2), np.asarray(R), atol=1e-5)
    # gaze d6 finite
    assert np.isfinite(np.asarray(gaze_to_d6(jnp.asarray([0.2, -0.1])))).all()


def test_render_with_gaze_and_angle_error():
    """Gaze-redirect driver (RenderUtils.py:164-220) + angular error
    metric (:158-162) on a gaze-conditioned tiny model."""
    import jax

    from nerf3dtalker_tpu.config import NeRFConfig
    from nerf3dtalker_tpu.models import HeadNeRF
    from nerf3dtalker_tpu.train.fitting import (
        gaze_angle_error,
        render_with_gaze,
    )
    from nerf3dtalker_tpu.utils.camera import base_cam, ray_grid

    cfg = NeRFConfig(
        featmap_size=8, featmap_nc=32, pred_img_size=32,
        num_sample_coarse=8, mlp_hidden=32, include_gaze=True,
    )
    model = HeadNeRF(cfg)
    xy, _ = ray_grid(cfg.featmap_size)
    cam = base_cam(cfg.featmap_size)
    shape = jnp.zeros((1, cfg.shape_code_dims))
    appea = jnp.zeros((1, cfg.appea_code_dims))
    aud = jnp.zeros((1, 64))
    params = model.init(
        jax.random.key(0), batch_xy=jnp.asarray(xy), shape_code=shape,
        appea_code=appea, audio_style=aud, Rmat=jnp.asarray(cam.Rmat),
        Tvec=jnp.asarray(cam.Tvec), inv_inmat=jnp.asarray(cam.inv_inmat),
    )
    gazes = np.array([[0.1, -0.2], [-0.3, 0.4]], np.float32)
    frames = render_with_gaze(model, params, shape, appea, aud, cam, gazes)
    assert frames.shape == (2, 32, 32, 3) and np.isfinite(frames).all()
    # different gazes -> different renders
    assert np.abs(frames[0] - frames[1]).max() > 0

    ev, eh = gaze_angle_error(gazes[0], gazes[1])
    np.testing.assert_allclose([ev, eh], [0.4, 0.6], atol=1e-6)
