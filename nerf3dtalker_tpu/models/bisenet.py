"""BiSeNet face parsing (flax, NHWC) + head-mask postprocessing.

Equivalents of reference `DataProcess/BiSeNet.py:11-280` (ResNet18 context
path, attention refinement, feature fusion, 3 output heads upsampled
bilinear align_corners=True) and the mask cleanup of
`DataProcess/Gen_HeadMask.py:16-181` / `correct_head_mask.py:5-90`
(19-class face-parsing argmax -> head/eye masks + morphology cleanup).
"""

from __future__ import annotations

from typing import List, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


class ConvBNReLU(nn.Module):
    feats: int
    ks: int = 3
    stride: int = 1
    padding: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        p = self.padding
        x = nn.Conv(self.feats, (self.ks, self.ks), strides=(self.stride,) * 2,
                    padding=[(p, p), (p, p)], use_bias=False, name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn")(x)
        return nn.relu(x)


class BasicBlock(nn.Module):
    feats: int
    stride: int = 1

    @nn.compact
    def __call__(self, x, train=False):
        y = nn.Conv(self.feats, (3, 3), strides=(self.stride,) * 2,
                    padding=[(1, 1), (1, 1)], use_bias=False, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.feats, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, name="bn2")(y)
        if self.stride != 1 or x.shape[-1] != self.feats:
            x = nn.Conv(self.feats, (1, 1), strides=(self.stride,) * 2,
                        use_bias=False, name="down_conv")(x)
            x = nn.BatchNorm(use_running_average=not train, name="down_bn")(x)
        return nn.relu(x + y)


class ResNet18Trunk(nn.Module):
    """DataProcess/resnet.py:58-80: returns 1/8, 1/16, 1/32 features."""

    @nn.compact
    def __call__(self, x, train=False):
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, name="conv1")(x)
        x = nn.BatchNorm(use_running_average=not train, name="bn1")(x)
        x = nn.relu(x)
        x = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)), constant_values=-jnp.inf)
        x = nn.max_pool(x, (3, 3), strides=(2, 2))
        for i, (c, s) in enumerate([(64, 1), (128, 2), (256, 2), (512, 2)]):
            for b in range(2):
                x = BasicBlock(c, s if b == 0 else 1, name=f"layer{i+1}_{b}")(x, train)
            if c == 128:
                feat8 = x
            elif c == 256:
                feat16 = x
        return feat8, feat16, x


def _nearest_resize(x, hw):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, hw[0], hw[1], C), method="nearest")


def _bilinear_ac_resize(x, hw):
    """Bilinear with align_corners=True (BiSeNet.py:249-251). jax.image uses
    half-pixel; emulate align_corners with explicit gather weights."""
    B, H, W, C = x.shape
    Ho, Wo = hw
    ys = jnp.linspace(0.0, H - 1.0, Ho)
    xs = jnp.linspace(0.0, W - 1.0, Wo)
    y0 = jnp.clip(jnp.floor(ys).astype(jnp.int32), 0, H - 1)
    x0 = jnp.clip(jnp.floor(xs).astype(jnp.int32), 0, W - 1)
    y1 = jnp.minimum(y0 + 1, H - 1)
    x1 = jnp.minimum(x0 + 1, W - 1)
    wy = (ys - y0)[None, :, None, None]
    wx = (xs - x0)[None, None, :, None]
    g = lambda yi, xi: x[:, yi][:, :, xi]
    top = g(y0, x0) * (1 - wx) + g(y0, x1) * wx
    bot = g(y1, x0) * (1 - wx) + g(y1, x1) * wx
    return top * (1 - wy) + bot * wy


class AttentionRefinement(nn.Module):
    feats: int

    @nn.compact
    def __call__(self, x, train=False):
        feat = ConvBNReLU(self.feats, name="conv")(x, train)
        att = jnp.mean(feat, axis=(1, 2), keepdims=True)
        att = nn.Conv(self.feats, (1, 1), use_bias=False, name="conv_atten")(att)
        att = nn.BatchNorm(use_running_average=not train, name="bn_atten")(att)
        return feat * nn.sigmoid(att)


class FeatureFusion(nn.Module):
    feats: int

    @nn.compact
    def __call__(self, fsp, fcp, train=False):
        feat = ConvBNReLU(self.feats, ks=1, padding=0, name="convblk")(
            jnp.concatenate([fsp, fcp], axis=-1), train
        )
        att = jnp.mean(feat, axis=(1, 2), keepdims=True)
        att = nn.relu(nn.Conv(self.feats // 4, (1, 1), use_bias=False, name="conv1")(att))
        att = nn.sigmoid(nn.Conv(self.feats, (1, 1), use_bias=False, name="conv2")(att))
        return feat * att + feat


class BiSeNet(nn.Module):
    """19-class face parsing net (BiSeNet.py:227-256; the spatial path is
    replaced by the resnet 1/8 feature, :240-243)."""

    n_classes: int = 19

    @nn.compact
    def __call__(self, x, train=False):
        H, W = x.shape[1:3]
        feat8, feat16, feat32 = ResNet18Trunk(name="resnet")(x, train)

        avg = jnp.mean(feat32, axis=(1, 2), keepdims=True)
        avg = ConvBNReLU(128, ks=1, padding=0, name="conv_avg")(avg, train)
        avg_up = jnp.broadcast_to(
            avg, (avg.shape[0], feat32.shape[1], feat32.shape[2], 128)
        )
        f32 = AttentionRefinement(128, name="arm32")(feat32, train) + avg_up
        f32_up = _nearest_resize(f32, feat16.shape[1:3])
        f32_up = ConvBNReLU(128, name="conv_head32")(f32_up, train)

        f16 = AttentionRefinement(128, name="arm16")(feat16, train) + f32_up
        f16_up = _nearest_resize(f16, feat8.shape[1:3])
        f16_up = ConvBNReLU(128, name="conv_head16")(f16_up, train)

        fuse = FeatureFusion(256, name="ffm")(feat8, f16_up, train)

        def head(x, mid, name):
            x = ConvBNReLU(mid, name=f"{name}_conv")(x, train)
            x = nn.Conv(self.n_classes, (1, 1), use_bias=False, name=f"{name}_out")(x)
            return _bilinear_ac_resize(x, (H, W))

        out = head(fuse, 256, "conv_out")
        out16 = head(f16_up, 64, "conv_out16")
        out32 = head(f32_up, 64, "conv_out32")
        return out, out16, out32


# face-parsing label ids (Gen_HeadMask.py usage): head-region classes
HEAD_CLASSES = (1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11, 12, 13, 17)  # skin..hair
EYE_CLASSES = (4, 5)


def head_mask_from_parsing(parsing: jnp.ndarray) -> jnp.ndarray:
    """argmax parsing [B, H, W] -> binary head mask (Gen_HeadMask.py:16-181
    semantics: union of face-region classes)."""
    mask = jnp.zeros_like(parsing, dtype=jnp.float32)
    for c in HEAD_CLASSES:
        mask = jnp.maximum(mask, (parsing == c).astype(jnp.float32))
    return mask


def eye_mask_from_parsing(parsing: jnp.ndarray) -> jnp.ndarray:
    mask = jnp.zeros_like(parsing, dtype=jnp.float32)
    for c in EYE_CLASSES:
        mask = jnp.maximum(mask, (parsing == c).astype(jnp.float32))
    return mask


def correct_head_mask(mask: np.ndarray, iterations: int = 2) -> np.ndarray:
    """Morphological cleanup (DataProcess/correct_head_mask.py:5-90):
    close small holes and keep the largest connected component. numpy/scipy
    offline postprocessing."""
    from scipy import ndimage

    m = mask > 0.5
    m = ndimage.binary_closing(m, iterations=iterations)
    m = ndimage.binary_opening(m, iterations=1)
    lab, n = ndimage.label(m)
    if n > 1:
        sizes = ndimage.sum(m, lab, range(1, n + 1))
        m = lab == (1 + int(np.argmax(sizes)))
    return m.astype(np.float32)
