"""Offline per-image nonlinear-3DMM fitting.

Equivalent of reference `Fitting3DMM/FittingNL3DMM.py:24-280` (two-stage
Adam: 50 iters pose-only, 200 iters pose+iden+expr+text+illu; saves
`{code(306), w2c R|T, inmat, inv_inmat}` per image :224-259) with losses
from `Utils/FittingNL3DMM_LossUtils.py:6-110` (masked photo, skin
uniformity, weighted 68-landmark, gamma smoothness, code regularizers).

TPU-first: both stages are fori_loop'd jits over the differentiable
rasterizer — a whole batch of images fits in two compiled calls.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerf3dtalker_tpu.models.face3d.nl3dmm import render_nl3dmm
from nerf3dtalker_tpu.utils.rotations import euler_to_rmat

# 68-landmark weights (FittingNL3DMM_LossUtils.py:22-27): nose bridge
# (28:31) and mouth (-8:) x20, normalized.
def landmark_weights() -> jnp.ndarray:
    w = np.ones(68, np.float32)
    w[28:31] = 20
    w[-8:] = 20
    return jnp.asarray(w / w.sum())


def fitting_losses(
    render, gt_imgs, head_mask, gt_lm2d, vert_colors, skinmask,
    iden, expr, text, gamma, lm_w: float = 0.5,
) -> Dict[str, jnp.ndarray]:
    """Weighted total (FittingNL3DMM_LossUtils.py:81-110)."""
    mask = head_mask * render.mask[..., None]
    denom = jnp.maximum(jnp.sum(mask) * 3, 1.0)
    img_loss = jnp.sum(((render.image - gt_imgs) ** 2) * mask) / denom

    lmw = landmark_weights()
    lm_loss = jnp.sum(
        jnp.sum((render.lm2d - gt_lm2d) ** 2, axis=-1) * lmw
    ) / (gt_lm2d.shape[0] * gt_lm2d.shape[1])

    g = gamma.reshape(-1, 9, 3)
    illu_loss = jnp.mean((g - jnp.mean(g, axis=2, keepdims=True)) ** 2)

    code_loss = 2.5 * (
        jnp.mean(iden ** 2) + jnp.mean(expr ** 2) + jnp.mean(text ** 2)
    )

    sm = skinmask.reshape(1, -1, 1)
    valid = jnp.maximum(jnp.sum(sm), 1.0)
    cmean = jnp.sum(vert_colors * sm, axis=1, keepdims=True) / valid
    skin_loss = jnp.sum(((vert_colors - cmean) ** 2) * sm) / (
        vert_colors.shape[0] * valid
    )

    total = (
        img_loss * 10.0 + lm_loss * lm_w + illu_loss * 0.01
        + code_loss * 0.001 + skin_loss * 0.1
    )
    return {
        "img": img_loss, "lm": lm_loss, "illu": illu_loss,
        "code_regu": code_loss, "skin": skin_loss, "total_loss": total,
    }


class Fit3DMMResult(NamedTuple):
    iden: jnp.ndarray
    expr: jnp.ndarray
    text: jnp.ndarray
    gamma: jnp.ndarray
    euler: jnp.ndarray
    tvec: jnp.ndarray
    losses: Dict[str, float]

    def code(self) -> jnp.ndarray:
        """The 306-d self-describing code vector saved per image
        (FittingNL3DMM.py:224-259: iden|expr|text|illu)."""
        return jnp.concatenate([self.iden, self.expr, self.text, self.gamma], -1)

    def w2c(self):
        R = euler_to_rmat(self.euler)
        return R, self.tvec


def fit_3dmm(
    geo_params, tex_params,
    gt_imgs: jnp.ndarray,        # [B, H, W, 3]
    head_mask: jnp.ndarray,      # [B, H, W, 1]
    gt_lm2d: jnp.ndarray,        # [B, 68, 2]
    inmat: jnp.ndarray,          # [B, 3, 3]
    faces: jnp.ndarray,
    lm_index: jnp.ndarray,
    skinmask: Optional[jnp.ndarray] = None,
    init_euler: Optional[jnp.ndarray] = None,
    init_tvec: Optional[jnp.ndarray] = None,
    stage1_iters: int = 50,
    stage2_iters: int = 200,
    lr1: float = 0.01,
    lr2: float = 0.01,
    chunk: int = 512,
) -> Fit3DMMResult:
    """Two-stage fit (FittingNL3DMM.py:92-221). Returns optimized codes and
    camera; the texture decoder's vertex colors are probed for skin loss."""
    B, H, W, _ = gt_imgs.shape
    V = None
    if skinmask is None:
        from nerf3dtalker_tpu.models.face3d.nl3dmm import POINT_NUM

        skinmask = jnp.ones((POINT_NUM,))

    z0 = jnp.zeros
    state = {
        "iden": z0((B, 100)), "expr": z0((B, 79)), "text": z0((B, 100)),
        "gamma": z0((B, 27)),
        "euler": init_euler if init_euler is not None else z0((B, 3)),
        "tvec": init_tvec if init_tvec is not None else
                jnp.tile(jnp.asarray([[0.0, 0.0, 5.0]]), (B, 1)),
    }

    def forward(s):
        from nerf3dtalker_tpu.models.face3d.nl3dmm import Linear3DMMTexture

        R = euler_to_rmat(s["euler"])
        render = render_nl3dmm(
            geo_params, tex_params,
            s["iden"], s["expr"], s["text"], s["gamma"],
            R, s["tvec"], inmat, faces, lm_index, H, W, chunk=chunk,
        )
        pn = tex_params["params"]["mu_tex"].shape[-1] // 3
        vcol = Linear3DMMTexture(point_num=pn).apply(tex_params, s["text"])
        return fitting_losses(
            render, gt_imgs, head_mask, gt_lm2d, vcol, skinmask,
            s["iden"], s["expr"], s["text"], s["gamma"],
        )

    def run_stage(s, keys, iters, lr):
        opt = optax.adam(lr)

        def loss_fn(free, frozen):
            return forward({**frozen, **free})["total_loss"]

        @jax.jit
        def stage(s):
            free = {k: s[k] for k in keys}
            frozen = {k: jax.lax.stop_gradient(s[k]) for k in s if k not in keys}
            o = opt.init(free)

            def body(_, carry):
                f, o = carry
                g = jax.grad(loss_fn)(f, frozen)
                u, o = opt.update(g, o, f)
                return (optax.apply_updates(f, u), o)

            f, _ = jax.lax.fori_loop(0, iters, body, (free, o))
            return {**frozen, **f}

        return stage(s)

    # stage 1: pose only (FittingNL3DMM.py:107-160)
    state = run_stage(state, ("euler", "tvec"), stage1_iters, lr1)
    # stage 2: everything (FittingNL3DMM.py:162-214)
    state = run_stage(
        state, ("euler", "tvec", "iden", "expr", "text", "gamma"),
        stage2_iters, lr2,
    )

    losses = {k: float(v) for k, v in forward(state).items()}
    return Fit3DMMResult(
        iden=state["iden"], expr=state["expr"], text=state["text"],
        gamma=state["gamma"], euler=state["euler"], tvec=state["tvec"],
        losses=losses,
    )
