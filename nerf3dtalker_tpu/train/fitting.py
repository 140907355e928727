"""Single-image latent/camera fitting — the inference driver.

Equivalent of reference `FittingImage`
(FittingSingleImage_new.py:620-997): given one image + mask + 3DMM codes,
run 300 Adam iterations over {iden, expr, appea code offsets} and camera
deltas {ΔEuler, ΔT} (perform_fitting :825-903, per-group learning rates
:846-860, lr decay 0.1^(it/300) :862-864), minimizing the photometric
losses plus cam/code regularizers; then render novel views on the 45-cam
orbit rig and latent morphs (save_res :918-966).

TPU-first: the entire fitting loop is one `lax.fori_loop` inside a single
jit — 300 iterations compile once and run without host round-trips.
"""

from __future__ import annotations

import functools
from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerf3dtalker_tpu.config import NeRFConfig
from nerf3dtalker_tpu.models import HeadNeRF
from nerf3dtalker_tpu.train.losses import (
    cam_reg_loss,
    code_reg_loss,
    fitting_total_loss,
    headnerf_losses,
)
from nerf3dtalker_tpu.utils.camera import orbit_cams, ray_grid
from nerf3dtalker_tpu.utils.rotations import euler_to_rmat


class FitVars(NamedTuple):
    """The optimized offsets (FittingSingleImage_new.py:825-840)."""

    iden_offset: jnp.ndarray    # [1, 100]
    expr_offset: jnp.ndarray    # [1, 79]
    appea_offset: jnp.ndarray   # [1, 127]
    delta_euler: jnp.ndarray    # [1, 3]
    delta_tvec: jnp.ndarray     # [1, 3]


def init_fit_vars() -> FitVars:
    return FitVars(
        iden_offset=jnp.zeros((1, 100)),
        expr_offset=jnp.zeros((1, 79)),
        appea_offset=jnp.zeros((1, 127)),
        delta_euler=jnp.zeros((1, 3)),
        delta_tvec=jnp.zeros((1, 3)),
    )


def make_fit_optimizer(init_lr: float = 0.01, iters: int = 300):
    """Per-group lrs x lambda decay 0.1^(it/300)
    (FittingSingleImage_new.py:846-864)."""
    decay = optax.exponential_decay(1.0, transition_steps=iters, decay_rate=0.1)
    group_scale = {
        "iden_offset": 1.5, "expr_offset": 1.5, "appea_offset": 1.0,
        "delta_euler": 0.1, "delta_tvec": 0.1,
    }

    def make(scale):
        return optax.chain(
            optax.scale_by_adam(),
            optax.scale_by_schedule(decay),
            optax.scale(-init_lr * scale),
        )

    return optax.multi_transform(
        {k: make(s) for k, s in group_scale.items()},
        param_labels=FitVars(*(k for k in FitVars._fields)),
    )


def apply_fit_vars(
    fit: FitVars,
    base_codes: Dict[str, jnp.ndarray],
    base_cam: Dict[str, jnp.ndarray],
    audio_exp: Optional[jnp.ndarray] = None,
):
    """Assemble codes and camera from base + offsets
    (build_code_and_cam, FittingSingleImage_new.py:769-816)."""
    expr = base_codes["expr"]
    if audio_exp is not None:
        expr = jnp.concatenate([audio_exp, expr[:, 64:]], axis=-1)
    shape_code = jnp.concatenate(
        [base_codes["iden"] + fit.iden_offset, expr + fit.expr_offset], axis=-1
    )
    appea_code = (
        jnp.concatenate([base_codes["text"], base_codes["illu"]], axis=-1)
        + fit.appea_offset
    )
    dR = euler_to_rmat(fit.delta_euler)                      # [1,3,3]
    Rmat = dR @ base_cam["Rmat"]
    Tvec = (dR @ base_cam["Tvec"][..., None])[..., 0] + fit.delta_tvec
    return shape_code, appea_code, Rmat, Tvec


def fit_single_image(
    model: HeadNeRF,
    params,
    gt_rgb: jnp.ndarray,          # [1, H, W, 3]
    head_mask: jnp.ndarray,       # [1, H, W, 1]
    base_codes: Dict[str, jnp.ndarray],
    base_cam: Dict[str, jnp.ndarray],   # Rmat [1,3,3], Tvec [1,3], inv_inmat
    audio_style: jnp.ndarray,     # [1, 64]
    audio_exp: Optional[jnp.ndarray] = None,
    iters: int = 300,
    init_lr: float = 0.01,
    vgg_params=None,
    opt_cam: bool = True,
):
    """Returns (FitVars, final losses dict). One jit, fori_loop inside."""
    cfg = model.cfg
    xy, _ = ray_grid(cfg.featmap_size)
    xy = jnp.asarray(xy)
    optimizer = make_fit_optimizer(init_lr, iters)

    def loss_fn(fit: FitVars):
        shape_code, appea_code, Rmat, Tvec = apply_fit_vars(
            fit, base_codes, base_cam, audio_exp
        )
        pred = model.apply(
            params,
            batch_xy=xy,
            shape_code=shape_code,
            appea_code=appea_code,
            audio_style=audio_style,
            Rmat=Rmat,
            Tvec=Tvec,
            inv_inmat=base_cam["inv_inmat"],
        )
        data = headnerf_losses(
            pred, gt_rgb, head_mask,
            bg_value=1.0 if cfg.bg_type == "white" else 0.0,
            vgg_params=vgg_params,
        )
        cam = cam_reg_loss(fit.delta_euler, fit.delta_tvec)
        code = code_reg_loss(
            fit.iden_offset, fit.expr_offset, fit.appea_offset
        )
        total = fitting_total_loss(data, cam, code)
        return total, data

    grad_fn = jax.grad(loss_fn, has_aux=True)

    @jax.jit
    def run(fit0):
        opt0 = optimizer.init(fit0)

        def body(_, carry):
            fit, opt = carry
            g, _ = grad_fn(fit)
            if not opt_cam:   # freeze camera deltas (reference :839-843)
                g = g._replace(
                    delta_euler=jnp.zeros_like(g.delta_euler),
                    delta_tvec=jnp.zeros_like(g.delta_tvec),
                )
            upd, opt = optimizer.update(g, opt, fit)
            return (optax.apply_updates(fit, upd), opt)

        fit, _ = jax.lax.fori_loop(0, iters, body, (fit0, opt0))
        return fit

    fit = run(init_fit_vars())
    _, losses = loss_fn(fit)
    return fit, {k: float(v) for k, v in losses.items()}


def render_novel_views(
    model: HeadNeRF, params, shape_code, appea_code, audio_style,
    view_num: int = 45,
):
    """45-view orbit render (RenderUtils.py:110-128) -> [V, H, W, 3]."""
    cfg = model.cfg
    xy, _ = ray_grid(cfg.featmap_size)
    xy = jnp.asarray(xy)
    cams = orbit_cams(view_num, cfg.featmap_size)

    @jax.jit
    def render_one(Rmat, Tvec, inv_inmat):
        return model.apply(
            params, batch_xy=xy, shape_code=shape_code, appea_code=appea_code,
            audio_style=audio_style, Rmat=Rmat, Tvec=Tvec, inv_inmat=inv_inmat,
        )["merge_img"][0]

    return np.stack([
        np.asarray(render_one(
            jnp.asarray(c.Rmat), jnp.asarray(c.Tvec), jnp.asarray(c.inv_inmat)
        ))
        for c in cams
    ])


def render_morphing(
    model: HeadNeRF, params, code_a, code_b, appea_code, audio_style, cam,
    steps: int = 15,
):
    """Latent interpolation render (RenderUtils.py morphing loop;
    FittingSingleImage_new.py:918-966 save_res)."""
    cfg = model.cfg
    xy, _ = ray_grid(cfg.featmap_size)
    xy = jnp.asarray(xy)

    @jax.jit
    def render_one(t):
        code = code_a * (1.0 - t) + code_b * t
        return model.apply(
            params, batch_xy=xy, shape_code=code, appea_code=appea_code,
            audio_style=audio_style, Rmat=jnp.asarray(cam.Rmat),
            Tvec=jnp.asarray(cam.Tvec), inv_inmat=jnp.asarray(cam.inv_inmat),
        )["merge_img"][0]

    ts = np.linspace(0.0, 1.0, steps)
    return np.stack([np.asarray(render_one(jnp.float32(t))) for t in ts])


def gaze_angle_error(input_gaze: np.ndarray, estimated_gaze: np.ndarray):
    """(vertical, horizontal) absolute gaze angle errors
    (Utils/RenderUtils.py:158-162 calculate_angle_error; averaged over a
    sequence at :300)."""
    err = np.abs(np.asarray(input_gaze) - np.asarray(estimated_gaze))
    return float(err[0]), float(err[1])


def render_with_gaze(
    model: HeadNeRF, params, shape_code, appea_code, audio_style, cam,
    gazes: np.ndarray,                # [N, 2] (pitch, yaw)
    scale_factor: float = 1.0,
):
    """Gaze-redirected renders (Utils/RenderUtils.py:164-220
    render_face_with_gaze): the gaze vector, tiled to the model's gaze
    dim and scaled, overwrites the trailing gaze slice of the shape code
    per frame. Requires a gaze-conditioned model (cfg.include_gaze)."""
    cfg = model.cfg
    assert cfg.include_gaze, "render_with_gaze needs cfg.include_gaze"
    gd = cfg.eye_gaze_dim
    xy, _ = ray_grid(cfg.featmap_size)
    xy = jnp.asarray(xy)

    @jax.jit
    def render_one(gaze_feat):
        return model.apply(
            params, batch_xy=xy, shape_code=shape_code,
            appea_code=appea_code, audio_style=audio_style,
            Rmat=jnp.asarray(cam.Rmat), Tvec=jnp.asarray(cam.Tvec),
            inv_inmat=jnp.asarray(cam.inv_inmat),
            gaze=gaze_feat[None],
        )["merge_img"][0]

    out = []
    for g in np.asarray(gazes, np.float32):
        feat = np.tile(g, gd // len(g)) * scale_factor
        out.append(np.asarray(render_one(jnp.asarray(feat))))
    return np.stack(out)
