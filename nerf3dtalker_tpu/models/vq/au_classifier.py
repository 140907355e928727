"""Per-AU binary classifiers.

Equivalent of reference `classifier_AU`
(StandardizedSpace/main/train_vq.py:60-93): a small CNN on face crops whose
`linear2` 256-d features feed the AU codebook (`AU_fea`, train_vq.py:278),
plus a sigmoid probability head. One module, vmapped over the 5 AUs
(AU10/14/20/25/26) instead of 5 separate checkpoints.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _instance_norm(x: jnp.ndarray) -> jnp.ndarray:
    """InstanceNorm2d (no affine): normalize over H,W per channel."""
    mean = jnp.mean(x, axis=(1, 2), keepdims=True)
    var = jnp.var(x, axis=(1, 2), keepdims=True)
    return (x - mean) / jnp.sqrt(var + 1e-5)


class AUClassifier(nn.Module):
    """[B, 112, 112, 3] crop -> (features [B, 256], prob [B, 1])."""

    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, x, deterministic: bool = True) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # conv spec mirrors train_vq.py:63-70 (5x5 convs, pad 1, IN, lrelu)
        spec = [(16, 2), (32, 1)]
        for i, (ch, s) in enumerate(spec):
            x = nn.Conv(ch, (5, 5), strides=(s, s), padding=[(1, 1), (1, 1)],
                        name=f"conv{i+1}")(x)
            x = _instance_norm(x)
            x = nn.leaky_relu(x, 0.2)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        spec = [(64, 2), (128, 1)]
        for i, (ch, s) in enumerate(spec):
            x = nn.Conv(ch, (5, 5), strides=(s, s), padding=[(1, 1), (1, 1)],
                        name=f"conv{i+3}")(x)
            x = _instance_norm(x)
            x = nn.leaky_relu(x, 0.2)
        x = nn.max_pool(x, (2, 2), strides=(2, 2))
        x = x.reshape(x.shape[0], -1)
        for i, feats in enumerate((1600, 512, 256)):
            x = nn.Dense(feats, name=f"linear{i}")(x)
            x = nn.leaky_relu(x, 0.2)
            x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        feats256 = x                                  # the AU_fea features
        x = nn.Dense(64, name="linear3")(x)
        x = nn.leaky_relu(x, 0.2)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        prob = nn.sigmoid(nn.Dense(1, name="linear4")(x))
        return feats256, prob


def au_dice_loss(pred: jnp.ndarray, target: jnp.ndarray, smooth: float = 1.0):
    """Soft dice for AU activation maps (reference main/loss.py au_dice_loss)."""
    p = pred.reshape(pred.shape[0], -1)
    t = target.reshape(target.shape[0], -1)
    inter = jnp.sum(p * t, axis=-1)
    return jnp.mean(1.0 - (2 * inter + smooth) / (jnp.sum(p, -1) + jnp.sum(t, -1) + smooth))


def au_bce_loss(pred: jnp.ndarray, target: jnp.ndarray):
    """Binary CE on sigmoid outputs (train_vq.py:281-302 AU loss)."""
    eps = 1e-7
    p = jnp.clip(pred, eps, 1 - eps)
    return -jnp.mean(target * jnp.log(p) + (1 - target) * jnp.log(1 - p))
