"""FAN 2D facial-landmark network (flax) + heatmap decoding.

Equivalent of the face_alignment package's 2D-FAN used by reference
`DataProcess/Gen_Landmark.py:12-95` (68-point landmarks -> `*_lm2d.txt`)
and `genlm_loss.py:12-70` (in-loop tensor variant): a stacked-hourglass
network over 256x256 crops producing 68 heatmaps at 64x64, decoded to
subpixel coordinates.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class ConvBlock(nn.Module):
    """FAN residual conv block: three 3x3 convs at C/2, C/4, C/4 with BN
    preactivations, concat, + skip."""

    feats: int

    @nn.compact
    def __call__(self, x, train=False):
        bn = lambda n: nn.BatchNorm(use_running_average=not train, name=n)
        c = self.feats
        y1 = nn.Conv(c // 2, (3, 3), padding="SAME", use_bias=False,
                     name="conv1")(nn.relu(bn("bn1")(x)))
        y2 = nn.Conv(c // 4, (3, 3), padding="SAME", use_bias=False,
                     name="conv2")(nn.relu(bn("bn2")(y1)))
        y3 = nn.Conv(c // 4, (3, 3), padding="SAME", use_bias=False,
                     name="conv3")(nn.relu(bn("bn3")(y2)))
        out = jnp.concatenate([y1, y2, y3], axis=-1)
        if x.shape[-1] != c:
            x = nn.Conv(c, (1, 1), use_bias=False, name="down")(
                nn.relu(bn("bn4")(x))
            )
        return out + x


class Hourglass(nn.Module):
    depth: int = 4
    feats: int = 256

    @nn.compact
    def __call__(self, x, train=False):
        def hg(x, level):
            up1 = ConvBlock(self.feats, name=f"b1_{level}")(x, train)
            low = nn.avg_pool(x, (2, 2), strides=(2, 2))
            low = ConvBlock(self.feats, name=f"b2_{level}")(low, train)
            if level > 1:
                low = hg(low, level - 1)
            else:
                low = ConvBlock(self.feats, name=f"b2plus_{level}")(low, train)
            low = ConvBlock(self.feats, name=f"b3_{level}")(low, train)
            B, H, W, C = low.shape
            up2 = jax.image.resize(low, (B, H * 2, W * 2, C), method="nearest")
            return up1 + up2

        return hg(x, self.depth)


class FAN(nn.Module):
    """Stacked-hourglass landmark detector: [B, 256, 256, 3] ->
    [B, 64, 64, 68] heatmaps (last stack)."""

    n_stacks: int = 4
    n_landmarks: int = 68

    @nn.compact
    def __call__(self, x, train=False):
        bn = lambda n: nn.BatchNorm(use_running_average=not train, name=n)
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    name="conv1")(x)
        x = nn.relu(bn("bn1")(x))
        x = ConvBlock(128, name="conv2")(x, train)
        x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = ConvBlock(128, name="conv3")(x, train)
        x = ConvBlock(256, name="conv4")(x, train)

        outputs = []
        prev = x
        for s in range(self.n_stacks):
            hg = Hourglass(name=f"hg_{s}")(prev, train)
            ll = ConvBlock(256, name=f"top_{s}")(hg, train)
            ll = nn.Conv(256, (1, 1), name=f"conv_last_{s}")(ll)
            ll = nn.relu(
                nn.BatchNorm(use_running_average=not train, name=f"bn_end_{s}")(ll)
            )
            hm = nn.Conv(self.n_landmarks, (1, 1), name=f"l_{s}")(ll)
            outputs.append(hm)
            if s < self.n_stacks - 1:
                prev = (
                    prev
                    + nn.Conv(256, (1, 1), name=f"bl_{s}")(ll)
                    + nn.Conv(256, (1, 1), name=f"al_{s}")(hm)
                )
        return outputs[-1]


def decode_heatmaps(heatmaps: jnp.ndarray, crop_size: int = 256) -> jnp.ndarray:
    """[B, H, W, L] -> [B, L, 2] subpixel landmark coords in crop pixels
    (face_alignment's get_preds_fromhm: argmax + quarter-pixel shift)."""
    B, H, W, L = heatmaps.shape
    flat = heatmaps.transpose(0, 3, 1, 2).reshape(B, L, -1)
    idx = jnp.argmax(flat, axis=-1)
    ys = (idx // W).astype(jnp.float32)
    xs = (idx % W).astype(jnp.float32)

    # quarter-pixel refinement toward the larger neighbor
    def gather(hm_bl, y, x):
        y = jnp.clip(y, 0, H - 1).astype(jnp.int32)
        x = jnp.clip(x, 0, W - 1).astype(jnp.int32)
        return hm_bl[y, x]

    hm = heatmaps.transpose(0, 3, 1, 2)                       # [B, L, H, W]
    gx = jax.vmap(jax.vmap(gather))(hm, ys, xs + 1) - jax.vmap(jax.vmap(gather))(hm, ys, xs - 1)
    gy = jax.vmap(jax.vmap(gather))(hm, ys + 1, xs) - jax.vmap(jax.vmap(gather))(hm, ys - 1, xs)
    xs = xs + 0.25 * jnp.sign(gx)
    ys = ys + 0.25 * jnp.sign(gy)
    scale = crop_size / W
    return jnp.stack([xs, ys], axis=-1) * scale


def landmark_heatmap_targets(
    lm: jnp.ndarray, hw: int = 64, sigma: float = 1.0
) -> jnp.ndarray:
    """[B, L, 2] coords (heatmap pixels) -> gaussian target heatmaps."""
    ys = jnp.arange(hw, dtype=jnp.float32)
    xs = jnp.arange(hw, dtype=jnp.float32)
    dy = ys[None, None, :, None] - lm[..., 1][:, :, None, None]
    dx = xs[None, None, None, :] - lm[..., 0][:, :, None, None]
    g = jnp.exp(-(dx ** 2 + dy ** 2) / (2 * sigma ** 2))
    return g.transpose(0, 2, 3, 1)                             # [B, H, W, L]
