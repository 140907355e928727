"""GFPGAN-v1 "clean" face restoration network.

Equivalent of the reference's face-enhancer slot
(`s_utils/face_enhancer.py:26-123`), which instantiates the external
`gfpgan.GFPGANer` with `arch='clean'` (GFPGANv1.4): a U-Net
degradation-removal encoder whose bottleneck regresses per-layer style
latents, and a StyleGAN2 "clean" decoder whose per-resolution features
are spatially modulated (SFT, on half the channels) by scale/shift maps
from the U-Net decoder.

This is a first-party flax implementation of that topology (the "clean"
variant is pure tensor ops — no StyleGAN custom CUDA kernels):

  * :class:`ModulatedConv` / :class:`StyleConv` / :class:`ToRGB` — the
    clean StyleGAN2 building blocks (style-modulated, demodulated conv;
    bilinear-interpolate upsampling);
  * :class:`StyleGAN2CleanDecoder` — constant input 4x4 -> out_size,
    two StyleConvs + ToRGB skip per octave, SFT conditioning on half the
    channels per resolution (`sft_half=True`, the GFPGANv1.4 config);
  * :class:`GFPGANClean` — conv_body_first + ResBlock down pyramid ->
    final_linear style latents (`different_w=True`: one 512-d latent per
    decoder layer) + ResUpBlock condition pyramid -> scale/shift maps.

Weight-conversion caveat: the torch `gfpgan` package and its released
checkpoints are not available in this image (zero egress), so
`convert_gfpgan_clean` is validated against a synthetically-constructed
state_dict with the published key names/shapes, not against GFPGANv1.4
values; the architecture follows the public `gfpganv1_clean_arch.py` /
`stylegan2_clean_arch.py` layer plan. Without weights the network still
functions as a deterministic learned-prior-free restorer is NOT claimed —
use `utils/video.unsharp_enhancer` for that; this module exists so real
weights drop in when available.
"""

from __future__ import annotations

import math
from typing import Dict, List, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def _lrelu(x):
    # clean-arch activations are PLAIN LeakyReLU(0.2) — the sqrt(2) gain
    # of original StyleGAN2's fused_leaky_relu appears in the clean
    # variant only as the explicit *sqrt(2) after StyleConv's modulated
    # conv ("for conversion"), not inside the activation
    return nn.leaky_relu(x, 0.2)


def _interp2x(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, 2 * H, 2 * W, C), "bilinear")


def _interp_half(x):
    B, H, W, C = x.shape
    return jax.image.resize(x, (B, H // 2, W // 2, C), "bilinear")


class ModulatedConv(nn.Module):
    """Style-modulated, optionally demodulated conv (clean StyleGAN2).

    weight is scaled by 1/sqrt(in*k*k); `style` comes from a Dense with
    bias init 1 so an untrained style is a no-op modulation."""

    out_ch: int
    kernel: int = 3
    demodulate: bool = True
    upsample: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray, style: jnp.ndarray) -> jnp.ndarray:
        B, H, W, C = x.shape
        k = self.kernel
        s = nn.Dense(C, name="modulation",
                     bias_init=nn.initializers.ones)(style)     # [B, C]
        w = self.param(
            "weight", nn.initializers.normal(1.0),
            (k, k, C, self.out_ch),
        ) / math.sqrt(C * k * k)
        # per-sample modulation: fold style into the input instead of
        # materializing per-sample weights (equivalent for conv)
        if self.upsample:
            x = _interp2x(x)
        xm = x * s[:, None, None, :]
        y = jax.lax.conv_general_dilated(
            xm, w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.demodulate:
            # demod factor from the modulated weight norm, per sample
            demod = jax.lax.rsqrt(
                jnp.einsum("bc,hwco->bo", s**2,
                           w**2) + 1e-8
            )                                                   # [B, out]
            y = y * demod[:, None, None, :]
        return y


class StyleConv(nn.Module):
    """clean StyleConv ordering: modulated conv -> *sqrt(2) -> +noise ->
    +bias -> LeakyReLU(0.2)."""

    out_ch: int
    demodulate: bool = True
    upsample: bool = False

    @nn.compact
    def __call__(self, x, style, noise: Optional[jnp.ndarray] = None):
        y = ModulatedConv(self.out_ch, 3, self.demodulate,
                          self.upsample, name="modulated_conv")(x, style)
        y = y * math.sqrt(2.0)                    # "for conversion" scale
        nw = self.param("noise_weight", nn.initializers.zeros, ())
        if noise is None:
            noise = jnp.zeros(y.shape[:3] + (1,))
        y = y + nw * noise
        b = self.param("bias", nn.initializers.zeros, (self.out_ch,))
        return _lrelu(y + b)


class ToRGB(nn.Module):
    @nn.compact
    def __call__(self, x, style, skip: Optional[jnp.ndarray] = None):
        y = ModulatedConv(3, 1, demodulate=False,
                          name="modulated_conv")(x, style)
        y = y + self.param("bias", nn.initializers.zeros, (3,))
        if skip is not None:
            y = y + _interp2x(skip)
        return y


class ResBlock(nn.Module):
    """Clean-arch encoder ResBlock: conv -> downsampled conv, with a
    1x1-skip on the bilinear-downsampled input."""

    out_ch: int

    @nn.compact
    def __call__(self, x):
        h = _lrelu(nn.Conv(x.shape[-1], (3, 3), name="conv1")(x))
        h = _interp_half(h)
        h = _lrelu(nn.Conv(self.out_ch, (3, 3), name="conv2")(h))
        skip = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                       name="skip")(_interp_half(x))
        return h + skip


class ResUpBlock(nn.Module):
    out_ch: int

    @nn.compact
    def __call__(self, x):
        h = _lrelu(nn.Conv(x.shape[-1], (3, 3), name="conv1")(x))
        h = _interp2x(h)
        h = _lrelu(nn.Conv(self.out_ch, (3, 3), name="conv2")(h))
        skip = nn.Conv(self.out_ch, (1, 1), use_bias=False,
                       name="skip")(_interp2x(x))
        return h + skip


def _channels(out_size: int, channel_multiplier: int = 2,
              narrow: float = 1.0) -> Dict[int, int]:
    c = {
        4: 512, 8: 512, 16: 512, 32: 512,
        64: 256 * channel_multiplier, 128: 128 * channel_multiplier,
        256: 64 * channel_multiplier, 512: 32 * channel_multiplier,
        1024: 16 * channel_multiplier,
    }
    return {r: max(int(v * narrow), 8) for r, v in c.items() if r <= out_size}


class StyleGAN2CleanDecoder(nn.Module):
    """Constant 4x4 -> out_size with per-resolution SFT conditioning on
    half the channels (StyleGAN2GeneratorCSFT, sft_half=True)."""

    out_size: int = 512
    num_style_feat: int = 512
    channel_multiplier: int = 2
    narrow: float = 1.0

    @nn.compact
    def __call__(
        self,
        latents: jnp.ndarray,              # [B, n_latent, 512]
        conditions: List[jnp.ndarray],     # scale/shift pairs, low->high res
    ) -> jnp.ndarray:
        ch = _channels(self.out_size, self.channel_multiplier, self.narrow)
        log_size = int(math.log2(self.out_size))
        B = latents.shape[0]
        const = self.param(
            "constant_input", nn.initializers.normal(1.0), (1, 4, 4, ch[4])
        )
        # stored per-layer noise buffers (`noises.noise_{i}`, NHWC here):
        # real GFPGAN inference runs randomize_noise=False, i.e. the SAME
        # stored noise scaled by each layer's learned noise_weight. Fresh
        # inits are zeros (identical to no noise); converted checkpoints
        # carry the released buffers.
        def stored_noise(i, res):
            return self.param(f"noise_{i}", nn.initializers.zeros,
                              (1, res, res, 1))

        x = jnp.tile(const, (B, 1, 1, 1))
        x = StyleConv(ch[4], name="style_conv1")(
            x, latents[:, 0], noise=stored_noise(0, 4)
        )
        skip = ToRGB(name="to_rgb1")(x, latents[:, 1])
        li = 1
        for i, res in enumerate(2**r for r in range(3, log_size + 1)):
            x = StyleConv(ch[res], upsample=True,
                          name=f"style_convs_{2*i}")(
                x, latents[:, li], noise=stored_noise(2 * i + 1, res)
            )
            # SFT: modulate the second half of the channels with this
            # resolution's (scale, shift) condition pair
            scale, shift = conditions[2 * i], conditions[2 * i + 1]
            half = x.shape[-1] // 2
            same, sft = x[..., :half], x[..., half:]
            x = jnp.concatenate([same, sft * scale + shift], axis=-1)
            x = StyleConv(ch[res],
                          name=f"style_convs_{2*i+1}")(
                x, latents[:, li + 1], noise=stored_noise(2 * i + 2, res)
            )
            skip = ToRGB(name=f"to_rgbs_{i}")(x, latents[:, li + 2], skip)
            li += 2
        return skip


class GFPGANClean(nn.Module):
    """images [B, S, S, 3] in [-1, 1] -> restored [B, S, S, 3]
    (GFPGANv1Clean forward, inference path)."""

    out_size: int = 512
    num_style_feat: int = 512
    channel_multiplier: int = 2
    narrow: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        unet_narrow = self.narrow * 0.5
        ch = _channels(self.out_size, self.channel_multiplier, unet_narrow)
        log_size = int(math.log2(self.out_size))
        n_latent = 2 * log_size - 2                 # different_w=True

        feat = _lrelu(nn.Conv(ch[self.out_size], (1, 1),
                              name="conv_body_first")(x))
        # down pyramid out_size -> 4, stashing post-block skips for the up
        # path (added at the matching resolution before each up block)
        skips = []
        res = self.out_size
        i = 0
        while res > 4:
            feat = ResBlock(ch[res // 2], name=f"conv_body_down_{i}")(feat)
            skips.append(feat)
            res //= 2
            i += 1
        feat = _lrelu(nn.Conv(ch[4], (3, 3), name="final_conv")(feat))
        bottleneck = feat

        # style latents from the bottleneck
        w = nn.Dense(n_latent * self.num_style_feat, name="final_linear")(
            bottleneck.reshape(bottleneck.shape[0], -1)
        )
        latents = w.reshape(-1, n_latent, self.num_style_feat)

        # up pyramid producing SFT conditions per resolution
        conditions: List[jnp.ndarray] = []
        res = 4
        i = 0
        while res < self.out_size:
            feat = feat + skips[-(i + 1)]
            feat = ResUpBlock(ch[res * 2], name=f"conv_body_up_{i}")(feat)
            res *= 2
            out_ch = ch[res]
            # sft_half=True: conditions cover HALF the decoder's channels
            # at this res — the decoder runs narrow=1 (2x the U-Net's
            # unet_narrow=0.5 widths), so that half equals out_ch exactly
            sft_ch = out_ch
            sc = nn.Conv(out_ch, (3, 3), name=f"condition_scale_{i}_0")(feat)
            sc = nn.Conv(sft_ch, (3, 3),
                         bias_init=nn.initializers.ones,
                         name=f"condition_scale_{i}_1")(_lrelu(sc))
            sh = nn.Conv(out_ch, (3, 3), name=f"condition_shift_{i}_0")(feat)
            sh = nn.Conv(sft_ch, (3, 3),
                         name=f"condition_shift_{i}_1")(_lrelu(sh))
            conditions += [sc, sh]
            i += 1

        dec = StyleGAN2CleanDecoder(
            self.out_size, self.num_style_feat, self.channel_multiplier,
            self.narrow, name="stylegan_decoder",
        )
        return dec(latents, conditions)


def restore_faces(params, frames: np.ndarray, model: Optional[GFPGANClean] = None,
                  batch: int = 4) -> np.ndarray:
    """face_enhancer.enhancer_list equivalent: [T, S, S, 3] float [0,1]
    frames through the restorer (which works in [-1, 1])."""
    model = model or GFPGANClean(out_size=frames.shape[1])
    out = []
    T = len(frames)
    fn = jax.jit(lambda p, f: model.apply(p, f))
    for s in range(0, T, batch):
        f = jnp.asarray(frames[s : s + batch] * 2.0 - 1.0)
        r = fn(params, f)
        out.append(np.asarray((r + 1.0) * 0.5))
    return np.clip(np.concatenate(out, axis=0), 0.0, 1.0)


def convert_gfpgan_clean(state_dict: Dict[str, np.ndarray],
                         out_size: int = 512) -> Dict:
    """Map a `GFPGANv1Clean` torch state_dict (published key names) onto
    this module's params. Torch convs are [out, in, kh, kw] -> HWIO.

    Validated in-image against a synthetically-shaped state_dict only
    (see module docstring caveat)."""
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    log_size = int(math.log2(out_size))

    def conv(prefix):
        w = sd[f"{prefix}.weight"].transpose(2, 3, 1, 0)
        out = {"kernel": jnp.asarray(w)}
        if f"{prefix}.bias" in sd:
            out["bias"] = jnp.asarray(sd[f"{prefix}.bias"])
        return out

    def resblock(prefix):
        return {
            "conv1": conv(f"{prefix}.conv1"),
            "conv2": conv(f"{prefix}.conv2"),
            "skip": conv(f"{prefix}.skip"),
        }

    p: Dict = {
        "conv_body_first": conv("conv_body_first"),
        "final_conv": conv("final_conv"),
        "final_linear": {
            "kernel": jnp.asarray(sd["final_linear.weight"].T),
            "bias": jnp.asarray(sd["final_linear.bias"]),
        },
    }
    n_down = log_size - 2
    for i in range(n_down):
        p[f"conv_body_down_{i}"] = resblock(f"conv_body_down.{i}")
        p[f"conv_body_up_{i}"] = resblock(f"conv_body_up.{i}")
        p[f"condition_scale_{i}_0"] = conv(f"condition_scale.{i}.0")
        p[f"condition_scale_{i}_1"] = conv(f"condition_scale.{i}.2")
        p[f"condition_shift_{i}_0"] = conv(f"condition_shift.{i}.0")
        p[f"condition_shift_{i}_1"] = conv(f"condition_shift.{i}.2")

    def mod_conv(prefix):
        # the modulated conv is NESTED: '{prefix}.modulated_conv.weight'
        # [1, out, in, k, k] + '...modulated_conv.modulation.{weight,bias}'
        w = sd[f"{prefix}.modulated_conv.weight"]
        w = w[0].transpose(2, 3, 1, 0)              # -> [k, k, in, out]
        k, cin = w.shape[0], w.shape[2]
        return {
            "weight": jnp.asarray(w * math.sqrt(cin * k * k)),
            "modulation": {
                "kernel": jnp.asarray(
                    sd[f"{prefix}.modulated_conv.modulation.weight"].T
                ),
                "bias": jnp.asarray(
                    sd[f"{prefix}.modulated_conv.modulation.bias"]
                ),
            },
        }

    def style_conv(dst, prefix):
        # clean StyleConv stores the NOISE strength as '{prefix}.weight'
        # (shape [1]) and the activation bias as '{prefix}.bias'
        # ([1, out, 1, 1])
        p.setdefault("stylegan_decoder", {})[dst] = {
            "modulated_conv": mod_conv(f"stylegan_decoder.{prefix}"),
            "noise_weight": jnp.asarray(
                sd[f"stylegan_decoder.{prefix}.weight"]
            ).reshape(()),
            "bias": jnp.asarray(
                sd[f"stylegan_decoder.{prefix}.bias"].reshape(-1)
            ),
        }

    def to_rgb(dst, prefix):
        p["stylegan_decoder"][dst] = {
            "modulated_conv": mod_conv(f"stylegan_decoder.{prefix}"),
            "bias": jnp.asarray(sd[f"stylegan_decoder.{prefix}.bias"].reshape(-1)),
        }

    p.setdefault("stylegan_decoder", {})["constant_input"] = jnp.asarray(
        sd["stylegan_decoder.constant_input.weight"].transpose(0, 2, 3, 1)
    )
    # stored noise buffers (randomize_noise=False inference): torch
    # [1, 1, r, r] -> NHWC [1, r, r, 1]
    for i in range(2 * (log_size - 2) + 1):
        key = f"stylegan_decoder.noises.noise_{i}"
        if key in sd:
            p["stylegan_decoder"][f"noise_{i}"] = jnp.asarray(
                sd[key].transpose(0, 2, 3, 1)
            )
    style_conv("style_conv1", "style_conv1")
    to_rgb("to_rgb1", "to_rgb1")
    for i in range(2 * (log_size - 2)):
        style_conv(f"style_convs_{i}", f"style_convs.{i}")
    for i in range(log_size - 2):
        to_rgb(f"to_rgbs_{i}", f"to_rgbs.{i}")
    return {"params": p}
