"""Lip-reading perceptual loss (SPECTRE-derived).

Equivalent of reference `lipsrc/lipread_loss.py:28-219`: a frozen AVSR
visual-speech encoder (3D front-end conv + ResNet18 trunk, the
LRS3-trained model of Visual_Speech_Recognition_for_Multiple_Languages)
extracts features from grayscale generated vs ground-truth frames; the
loss is 1 - mean cosine similarity (:157-166). Mouth crops are taken
around the smoothed mouth-landmark center (:170-219).

The encoder here reproduces the standard AVSR visual front-end topology so
converted weights drop in; with random weights it still serves as a fixed
random-projection perceptual loss (the training signal the reference gets
is "match features of the same frozen net").
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def rgb_to_grayscale(img: jnp.ndarray) -> jnp.ndarray:
    """[..., 3] -> [..., 1], ITU-R 601 (torchvision rgb_to_grayscale)."""
    w = jnp.asarray([0.299, 0.587, 0.114], img.dtype)
    return jnp.sum(img * w, axis=-1, keepdims=True)


class VisualFrontend(nn.Module):
    """AVSR visual encoder: Conv3D front-end + 2D ResNet18 trunk ->
    512-d per-frame features (`extract_resnet_feats=True` path,
    lipread_loss.py:146-156)."""

    @nn.compact
    def __call__(self, frames: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        """frames [B, T, H, W, 1] grayscale in [0, 255] -> [B, T, 512]."""
        B, T, H, W, _ = frames.shape
        x = frames / 255.0
        # 3D front-end: conv3d k=(5,7,7) s=(1,2,2) + BN + ReLU + maxpool3d
        x = nn.Conv(64, (5, 7, 7), strides=(1, 2, 2),
                    padding=[(2, 2), (3, 3), (3, 3)], use_bias=False,
                    name="front3d")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn3d")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (1, 3, 3), strides=(1, 2, 2), padding=((0, 0), (1, 1), (1, 1)))
        # fold time into batch for the 2D trunk
        x = x.reshape(B * T, *x.shape[2:])
        from nerf3dtalker_tpu.models.bisenet import BasicBlock

        for li, (c, s) in enumerate([(64, 1), (128, 2), (256, 2), (512, 2)]):
            for b in range(2):
                x = BasicBlock(c, s if b == 0 else 1,
                               name=f"layer{li+1}_{b}")(x, train)
        x = jnp.mean(x, axis=(1, 2))                      # global avg pool
        return x.reshape(B, T, 512)


def lipread_loss(
    params,
    img_gen: jnp.ndarray,   # [T, H, W, 3] in [0,1]
    img_gt: jnp.ndarray,    # [T, H, W, 3]
    model: Optional[VisualFrontend] = None,
) -> jnp.ndarray:
    """1 - mean cosine similarity of frozen visual-speech features
    (lipread_loss.py:140-166). Gradients flow into img_gen only."""
    model = model or VisualFrontend()
    g = rgb_to_grayscale(img_gen * 255.0)[None]
    t = rgb_to_grayscale(img_gt * 255.0)[None]
    f_gen = model.apply(params, g).reshape(-1, 512)
    f_gt = jax.lax.stop_gradient(model.apply(params, t).reshape(-1, 512))
    num = jnp.sum(f_gen * f_gt, axis=1)
    den = jnp.linalg.norm(f_gen, axis=1) * jnp.linalg.norm(f_gt, axis=1)
    return 1.0 - jnp.mean(num / jnp.maximum(den, 1e-8))


def mouth_transform(
    crops: jnp.ndarray,        # [T, 96, 96, 1] grayscale in [0, 1]
    crop_size: int = 88,
    mean: float = 0.421,
    std: float = 0.165,
) -> jnp.ndarray:
    """The reference's pre-network mouth transform
    (lipread_loss.py:113-121): CenterCrop(88, 88) then
    Normalize(mean=0.421, std=0.165) — the LRS3 lipreader's input
    statistics."""
    H, W = crops.shape[1:3]
    y0 = (H - crop_size) // 2
    x0 = (W - crop_size) // 2
    c = crops[:, y0 : y0 + crop_size, x0 : x0 + crop_size]
    return (c - mean) / std


# 68-landmark mouth indices used by the crop (lipread_loss setup:
# _start_idx=48, _stop_idx=68)
MOUTH_START, MOUTH_STOP = 48, 68


def cut_mouth(
    images: np.ndarray,      # [T, H, W, C] float
    landmarks: np.ndarray,   # [T, 68, 2] normalized [-1, 1]
    crop_height: int = 96,
    crop_width: int = 96,
    window_margin: int = 12,
    convert_grayscale: bool = True,
) -> np.ndarray:
    """Temporally-smoothed mouth crops (lipread_loss.py:170-219). Offline
    numpy preprocessing (dynamic crop windows are host-side by design)."""
    lms = landmarks * 112 + 112
    T = len(images)
    out = []
    for i in range(T):
        wm = min(window_margin // 2, i, T - 1 - i)
        sm = lms[i - wm : i + wm + 1].mean(axis=0)
        sm = sm + (lms[i].mean(axis=0) - sm.mean(axis=0))
        cx, cy = np.round(sm[MOUTH_START:MOUTH_STOP].mean(axis=0))
        h, w = crop_height // 2, crop_width // 2
        H, W = images.shape[1:3]
        cy = min(max(cy, h), H - h)
        cx = min(max(cx, w), W - w)
        img = images[i]
        if convert_grayscale:
            img = np.asarray(rgb_to_grayscale(jnp.asarray(img)))
        out.append(img[int(cy - h) : int(cy + h), int(cx - w) : int(cx + w)])
    return np.stack(out)
