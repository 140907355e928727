"""HeadNeRF training losses.

Equivalent of reference `HeadNeRFLossUtils` (Utils/HeadNeRFLossUtils.py:67-236):
  * bg loss       — MSE of the rendered background image against the bg value;
  * head loss     — MSE over head-mask pixels of merge_img vs GT;
  * nonhead loss  — MSE of merge_img against the bg value outside the head;
  * vgg loss      — VGG16 perceptual L1 between merge_img and the GT with its
                    background masked to the bg value (HeadNeRFLossUtils.py:148-153);
  * cam / code regularizers for the fitting driver (:88-122).

Masked selection (`res_img[mask]`) becomes masked-mean with static shapes —
boolean gather would produce dynamic shapes under jit.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from nerf3dtalker_tpu.models.perceptual import vgg_perceptual_loss


def _masked_mse(x: jnp.ndarray, y, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of (x - y)^2 over mask (broadcast over channels)."""
    se = (x - y) ** 2 * mask
    denom = jnp.sum(mask) * x.shape[-1]
    return jnp.sum(se) / jnp.maximum(denom, 1.0)


def headnerf_losses(
    pred: Dict[str, jnp.ndarray],
    gt_rgb: jnp.ndarray,          # [B, H, W, 3] in [0,1]
    head_mask: jnp.ndarray,       # [B, H, W, 1] (>=0.5 is head)
    bg_value: float = 1.0,
    vgg_params=None,
    vgg_compute_dtype=None,
    gt_vgg_feats=None,            # precomputed vgg_features(masked GT)
) -> Dict[str, jnp.ndarray]:
    """Data losses (HeadNeRFLossUtils.py:125-156 + total at :196-236).

    `gt_vgg_feats`: the masked-GT branch's block activations precomputed
    offline per frame (they are parameter-independent), halving the VGG
    cost of the step — SURVEY §7 'precompute, don't inline'.
    """
    head = (head_mask >= 0.5).astype(gt_rgb.dtype)
    nonhead = 1.0 - head

    bg_img = pred["bg_img"]
    bg_loss = jnp.mean((bg_img - bg_value) ** 2)

    res_img = jnp.nan_to_num(pred["merge_img"])
    head_loss = _masked_mse(res_img, gt_rgb, head)
    nonhead_loss = _masked_mse(res_img, bg_value, nonhead)

    losses = {
        "bg_loss": bg_loss,
        "head_loss": head_loss,
        "nonhead_loss": nonhead_loss,
    }
    if vgg_params is not None:
        masked_gt = None
        if gt_vgg_feats is None:
            masked_gt = gt_rgb * head + bg_value * nonhead
        losses["vgg"] = vgg_perceptual_loss(
            vgg_params, res_img, masked_gt,
            compute_dtype=vgg_compute_dtype, target_feats=gt_vgg_feats,
        )

    losses["total_loss"] = sum(losses.values())
    return losses


def cam_reg_loss(delta_euler: jnp.ndarray, delta_tvec: jnp.ndarray) -> Dict:
    """Camera-offset regularizers for fitting (HeadNeRFLossUtils.py:88-96)."""
    return {
        "delta_eular": jnp.mean(delta_euler ** 2),
        "delta_tvec": jnp.mean(delta_tvec ** 2),
    }


def code_reg_loss(
    iden: jnp.ndarray,
    expr: jnp.ndarray,
    appea: jnp.ndarray,
    bg: Optional[jnp.ndarray] = None,
) -> Dict:
    """Latent-offset regularizers for fitting (HeadNeRFLossUtils.py:99-122)."""
    out = {
        "iden_code": jnp.mean(iden ** 2),
        "expr_code": jnp.mean(expr ** 2),
        "appea_code": jnp.mean(appea ** 2),
        "bg_code": jnp.mean(bg ** 2) if bg is not None else jnp.asarray(0.0),
    }
    return out


def fitting_total_loss(data_losses: Dict, cam_losses: Dict, code_losses: Dict):
    """Weighted fitting objective (HeadNeRFLossUtils.py:209-220 weights)."""
    total = data_losses["total_loss"]
    total = total + 0.001 * cam_losses["delta_eular"] + 0.001 * cam_losses["delta_tvec"]
    total = (
        total
        + 0.001 * code_losses["iden_code"]
        + 1.0 * code_losses["expr_code"]
        + 0.001 * code_losses["appea_code"]
        + 0.01 * code_losses["bg_code"]
    )
    return total
