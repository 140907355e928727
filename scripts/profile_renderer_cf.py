"""Measure a channel-first rgb-path NeuralRenderer variant vs baseline.

Hypothesis: the rgb pyramid arrays are [B,H,W,3] (channel-last); TPU pads the
minor (lane) dim 3 -> 128, a ~42x bandwidth waste on every blur/bilinear/add
at up to 512x512. Keeping rgb as [B,3,H,W] (H in sublanes, W in lanes) should
remove most of the renderer's HBM cost.

Run: PYTHONPATH=/root/repo:/root/.axon_site python scripts/profile_renderer_cf.py
"""
import json
import math

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from nerf3dtalker_tpu.config import reso64
from nerf3dtalker_tpu.models.neural_renderer import (
    NeuralRenderer, PixelShuffleUpsample, blur3,
)
from nerf3dtalker_tpu.utils.timing import chained_time

cfg = reso64()
B = 1
rng = np.random.default_rng(0)
feat = jnp.asarray(
    rng.standard_normal((B, cfg.featmap_size, cfg.featmap_size, cfg.featmap_nc))
    .astype(np.float32)
)


def blur3_cf(x):
    """[B,3,H,W] separable [1,2,1]/4 blur, reflect pad, over axes (2,3)."""
    x = jnp.pad(x, ((0, 0), (0, 0), (1, 1), (0, 0)), mode="reflect")
    x = (x[:, :, :-2] + 2.0 * x[:, :, 1:-1] + x[:, :, 2:]) * 0.25
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (1, 1)), mode="reflect")
    x = (x[:, :, :, :-2] + 2.0 * x[:, :, :, 1:-1] + x[:, :, :, 2:]) * 0.25
    return x


def bilinear_2x_cf(x):
    b, c, h, w = x.shape
    return jax.image.resize(x, (b, c, 2 * h, 2 * w), method="linear")


class RendererCF(nn.Module):
    """NeuralRenderer with the rgb skip pyramid kept channel-first."""

    feat_nc: int = 256
    min_feat: int = 32
    featmap_size: int = 64
    img_size: int = 512
    compute_dtype: jnp.dtype = jnp.bfloat16

    def setup(self):
        self.n_blocks = int(math.log2(self.img_size) - math.log2(self.featmap_size))

        def featn(i):
            return max(self.feat_nc // (2 ** i), self.min_feat)

        cdt = self.compute_dtype
        self.feat_upsamples = [
            PixelShuffleUpsample(featn(i), compute_dtype=cdt,
                                 name=f"feat_upsample_{i}")
            for i in range(self.n_blocks)
        ]
        self.feat_layers_ = [
            nn.Dense(featn(i + 1), dtype=cdt, name=f"feat_layer_{i}")
            for i in range(self.n_blocks)
        ]
        ins = [featn(0)] + [featn(i + 1) for i in range(self.n_blocks)]
        self.rgb_kernels = [
            self.param(f"feat_2_rgb_{i}_kernel",
                       nn.initializers.lecun_normal(), (ins[i], 3))
            for i in range(self.n_blocks + 1)
        ]
        self.rgb_biases = [
            self.param(f"feat_2_rgb_{i}_bias", nn.initializers.zeros, (3,))
            for i in range(self.n_blocks + 1)
        ]
        self.bg_param = self.param(
            "bg_featmap", nn.initializers.ones,
            (1, self.featmap_size, self.featmap_size, self.feat_nc),
        )

    def bg_featmap(self):
        return self.bg_param

    def _to_rgb_cf(self, idx, net):
        k = self.rgb_kernels[idx].astype(self.compute_dtype)
        b = self.rgb_biases[idx].astype(self.compute_dtype)
        return (jnp.einsum("bhwc,cr->brhw", net.astype(self.compute_dtype), k)
                + b[None, :, None, None])

    def __call__(self, x):
        x = x.astype(self.compute_dtype)
        rgb = bilinear_2x_cf(self._to_rgb_cf(0, x))
        rgb = blur3_cf(rgb)
        net = x
        for idx in range(self.n_blocks):
            hid = self.feat_layers_[idx](self.feat_upsamples[idx](net))
            net = nn.leaky_relu(hid, 0.2)
            rgb = rgb + self._to_rgb_cf(idx + 1, net)
            if idx < self.n_blocks - 1:
                rgb = blur3_cf(bilinear_2x_cf(rgb))
        rgb = rgb.astype(jnp.float32)
        return nn.sigmoid(rgb)  # [B, 3, H, W]


def time_model(name, model, out_cf):
    params = model.init(jax.random.key(0), feat)

    def rloss(p, f):
        img1 = model.apply(p, f)
        bg = model.apply(p, model.bind(p).bg_featmap())
        return jnp.mean((img1 - 0.5) ** 2) + jnp.mean((bg - 1.0) ** 2)

    g = jax.grad(rloss)
    dt = chained_time(
        lambda p: g(p, feat),
        lambda p, gr: jax.tree.map(lambda a, b: a - 1e-9 * b, p, gr),
        params, iters=10,
    )
    print(json.dumps({"variant": name, "ms": round(dt * 1e3, 2)}), flush=True)


time_model(
    "baseline_nhwc",
    NeuralRenderer(feat_nc=cfg.featmap_nc, out_dim=3, final_actvn=True,
                   min_feat=32, featmap_size=cfg.featmap_size,
                   img_size=cfg.pred_img_size, bg_type=cfg.bg_type,
                   compute_dtype=jnp.bfloat16),
    False,
)
time_model(
    "rgb_channel_first",
    RendererCF(feat_nc=cfg.featmap_nc, featmap_size=cfg.featmap_size,
               img_size=cfg.pred_img_size, compute_dtype=jnp.bfloat16),
    True,
)
