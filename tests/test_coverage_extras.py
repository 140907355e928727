"""Coverage for remaining paths: VGG perceptual loss in training, camera
optimization in fitting, gaze conditioning, scaling harness."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerf3dtalker_tpu.config import NeRFConfig, TrainConfig
from nerf3dtalker_tpu.models import HeadNeRF
from nerf3dtalker_tpu.models.perceptual import (
    init_vgg16,
    vgg_perceptual_loss,
)
from nerf3dtalker_tpu.utils.camera import base_cam, ray_grid

TINY = NeRFConfig(
    featmap_size=8, featmap_nc=32, pred_img_size=32, num_sample_coarse=8,
    mlp_hidden=32,
)


def test_vgg_loss_in_train_step():
    from nerf3dtalker_tpu.train.step import build_step_fns

    vgg_params = init_vgg16(jax.random.key(0))
    fns = build_step_fns(
        TINY, TrainConfig(bf16_compute=False), vgg_params=vgg_params
    )
    rng = np.random.default_rng(0)
    xy, _ = ray_grid(8)
    cam = base_cam(8)
    f32 = np.float32
    batch = {
        "mels": jnp.asarray(rng.standard_normal((1, 80, 16)).astype(f32)),
        "gt_rgb": jnp.asarray(rng.uniform(0, 1, (1, 32, 32, 3)).astype(f32)),
        "head_mask": jnp.ones((1, 32, 32, 1)),
        "iden": jnp.zeros((1, 100)), "expr": jnp.zeros((1, 79)),
        "text": jnp.zeros((1, 100)), "illu": jnp.zeros((1, 27)),
        "audio_exp": jnp.zeros((1, 64)),
        "Rmat": jnp.asarray(cam.Rmat), "Tvec": jnp.asarray(cam.Tvec),
        "inv_inmat": jnp.asarray(cam.inv_inmat), "xy": jnp.asarray(xy),
    }
    state = fns.init(jax.random.key(0), batch)
    state, losses = fns.train_step(state, batch, jax.random.key(1))
    assert "vgg" in losses and np.isfinite(float(losses["vgg"]))
    assert float(losses["vgg"]) > 0


def test_vgg_loss_zero_for_identical():
    vgg_params = init_vgg16(jax.random.key(0))
    img = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, 64, 64, 3)).astype(np.float32)
    )
    assert float(vgg_perceptual_loss(vgg_params, img, img)) < 1e-6
    other = jnp.clip(img + 0.3, 0, 1)
    assert float(vgg_perceptual_loss(vgg_params, img, other)) > 0


def test_fitting_with_camera_optimization():
    from nerf3dtalker_tpu.train.fitting import fit_single_image

    rng = np.random.default_rng(0)
    model = HeadNeRF(TINY)
    xy, _ = ray_grid(8)
    cam = base_cam(8)
    codes = {
        k: jnp.asarray(rng.standard_normal((1, d)).astype(np.float32) * 0.1)
        for k, d in (("iden", 100), ("expr", 79), ("text", 100), ("illu", 27))
    }
    caminfo = {
        "Rmat": jnp.asarray(cam.Rmat), "Tvec": jnp.asarray(cam.Tvec),
        "inv_inmat": jnp.asarray(cam.inv_inmat),
    }
    aud = jnp.zeros((1, 64))
    shape = jnp.concatenate([codes["iden"], codes["expr"]], -1)
    appea = jnp.concatenate([codes["text"], codes["illu"]], -1)
    inp = dict(batch_xy=jnp.asarray(xy), shape_code=shape, appea_code=appea,
               audio_style=aud, **{k.replace("Rmat", "Rmat"): v for k, v in caminfo.items()})
    params = model.init(jax.random.key(0), **inp)
    target = model.apply(params, **inp)["merge_img"]
    mask = jnp.ones_like(target[..., :1])

    fit, losses = fit_single_image(
        model, params, target, mask, codes, caminfo, aud,
        iters=10, init_lr=0.01, opt_cam=True,
    )
    assert np.isfinite(losses["total_loss"])
    # camera deltas moved (they receive gradient when opt_cam=True)
    assert float(jnp.abs(fit.delta_euler).max()) > 0


def test_gaze_conditioning():
    cfg = dataclasses.replace(TINY, include_gaze=True, eye_gaze_dim=2)
    model = HeadNeRF(cfg)
    rng = np.random.default_rng(0)
    xy, _ = ray_grid(8)
    cam = base_cam(8)
    inp = dict(
        batch_xy=jnp.asarray(xy),
        shape_code=jnp.asarray(rng.standard_normal((1, 179)).astype(np.float32) * 0.1),
        appea_code=jnp.zeros((1, 127)), audio_style=jnp.zeros((1, 64)),
        Rmat=jnp.asarray(cam.Rmat), Tvec=jnp.asarray(cam.Tvec),
        inv_inmat=jnp.asarray(cam.inv_inmat),
    )
    params = model.init(jax.random.key(0), **inp)
    a = model.apply(params, **inp, gaze=jnp.zeros((1, 2)))["merge_img"]
    b = model.apply(params, **inp, gaze=jnp.full((1, 2), 0.5))["merge_img"]
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # default gaze (None) == zeros
    c = model.apply(params, **inp)["merge_img"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(c), atol=1e-6)


def test_scaling_harness_runs():
    import bench_scaling
    from nerf3dtalker_tpu.parallel import make_mesh

    tc = TrainConfig(bf16_compute=False, use_vgg_loss=False)
    r1 = bench_scaling.measure(make_mesh(1, 1), TINY, tc, B=1, iters=2)
    rn = bench_scaling.measure(make_mesh(2, 4), TINY, tc, B=2, iters=2)
    assert r1 > 0 and rn > 0
