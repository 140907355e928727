"""Neural 2D renderer: featmap -> image upsampler decoder.

Equivalent of reference `NeuralRenderer` (NetWorks/neural_renderer.py:11-91)
and `PixelShuffleUpsample`/`Blur` (NetWorks/PixelShuffleUpsample.py:8-45),
rewritten NHWC for TPU:

  * pixel-shuffle is a pure reshape/transpose (free for XLA);
  * the 3x3 binomial blur (kornia filter2d, normalized, reflect padding)
    is implemented as two separable 1D passes — elementwise adds the VPU
    fuses into the surrounding convs;
  * bilinear x2 upsample uses half-pixel sampling, matching
    `nn.Upsample(mode='bilinear', align_corners=False)`.

The learnable white/black background featmap lives here
(`neural_renderer.py:31-46`), exposed via `bg_featmap()`.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def blur3(x: jnp.ndarray) -> jnp.ndarray:
    """Separable [1,2,1]⊗[1,2,1]/16 blur with reflect padding, NHWC.

    Matches kornia.filters.filter2d(x, [1,2,1]^T @ [1,2,1], normalized=True)
    with its default border_type='reflect' (PixelShuffleUpsample.py:15-18).
    """
    x = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0)), mode="reflect")
    x = (x[:, :-2] + 2.0 * x[:, 1:-1] + x[:, 2:]) * 0.25
    x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="reflect")
    x = (x[:, :, :-2] + 2.0 * x[:, :, 1:-1] + x[:, :, 2:]) * 0.25
    return x


def pixel_shuffle_2x(x: jnp.ndarray) -> jnp.ndarray:
    """NHWC pixel shuffle, upscale 2: [B,H,W,4C] -> [B,2H,2W,C].

    Channel index decomposition (c*4 + di*2 + dj) matches torch
    F.pixel_shuffle on NCHW (PixelShuffleUpsample.py:42).
    """
    B, H, W, C4 = x.shape
    C = C4 // 4
    x = x.reshape(B, H, W, C, 2, 2)
    x = x.transpose(0, 1, 4, 2, 5, 3)  # B, H, 2, W, 2, C
    return x.reshape(B, 2 * H, 2 * W, C)


def bilinear_2x(x: jnp.ndarray) -> jnp.ndarray:
    """Half-pixel bilinear x2 (== torch align_corners=False), NHWC."""
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), method="linear")


class PixelShuffleUpsample(nn.Module):
    """conv1x1(c->2c) -> lrelu -> conv1x1(2c->4c) -> lrelu, plus the
    channel-tiled identity, then pixel-shuffle and blur
    (PixelShuffleUpsample.py:29-45)."""

    features: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.features
        # torch `x.repeat(1, 4, 1, 1)` tiles whole channel blocks: index
        # k = m*C + c  (m in 0..3) — i.e. NHWC tile along the channel axis.
        y = jnp.tile(x, (1, 1, 1, 4))
        out = nn.Dense(2 * c, dtype=self.compute_dtype, name="layer_1")(x)
        out = nn.leaky_relu(out, 0.2)
        out = nn.Dense(4 * c, dtype=self.compute_dtype, name="layer_2")(out)
        out = nn.leaky_relu(out, 0.2)
        out = out + y
        out = pixel_shuffle_2x(out)
        return blur3(out)


class NeuralRenderer(nn.Module):
    """Feature map [B, S, S, feat_nc] -> RGB image [B, img, img, 3]."""

    feat_nc: int = 256
    out_dim: int = 3
    final_actvn: bool = True
    min_feat: int = 32
    featmap_size: int = 32
    img_size: int = 256
    bg_type: str = "white"
    compute_dtype: jnp.dtype = jnp.float32

    def setup(self):
        import math

        self.n_blocks = int(math.log2(self.img_size) - math.log2(self.featmap_size))

        def feat(i):
            return max(self.feat_nc // (2 ** i), self.min_feat)

        cdt = self.compute_dtype
        self.feat_upsamples = [
            PixelShuffleUpsample(feat(i), compute_dtype=cdt,
                                 name=f"feat_upsample_{i}")
            for i in range(self.n_blocks)
        ]
        self.feat_layers_ = [
            nn.Dense(feat(i + 1), dtype=cdt, name=f"feat_layer_{i}")
            for i in range(self.n_blocks)
        ]
        self.feat_2_rgb = [
            nn.Dense(self.out_dim, dtype=cdt, name=f"feat_2_rgb_{i}")
            for i in range(self.n_blocks + 1)
        ]
        init = nn.initializers.ones if self.bg_type == "white" else nn.initializers.zeros
        self.bg_param = self.param(
            "bg_featmap", init, (1, self.featmap_size, self.featmap_size, self.feat_nc)
        )

    def bg_featmap(self) -> jnp.ndarray:
        return self.bg_param

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # rgb skip pyramid (neural_renderer.py:72-91); runs in compute_dtype
        # (bf16 on TPU) with the final sigmoid in f32
        x = x.astype(self.compute_dtype)
        rgb = bilinear_2x(self.feat_2_rgb[0](x))
        rgb = blur3(rgb)
        net = x
        for idx in range(self.n_blocks):
            hid = self.feat_layers_[idx](self.feat_upsamples[idx](net))
            net = nn.leaky_relu(hid, 0.2)
            rgb = rgb + self.feat_2_rgb[idx + 1](net)
            if idx < self.n_blocks - 1:
                rgb = blur3(bilinear_2x(rgb))
        rgb = rgb.astype(jnp.float32)
        if self.final_actvn:
            rgb = nn.sigmoid(rgb)
        return rgb
