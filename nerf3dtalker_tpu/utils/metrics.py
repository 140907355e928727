"""Image quality metrics: SSIM / PSNR (jnp) + LPIPS (flax AlexNet).

Equivalents of reference Utils/Eval_utils.py:
  * SSIM — skimage `structural_similarity` semantics on uint8 grayscale
    (uniform 7x7 window, K1=0.01, K2=0.03, data_range 255; Eval_utils.py:56-68);
  * PSNR — cv2.PSNR == 10 log10(255^2 / MSE) on uint8 (Eval_utils.py:104-109);
  * LPIPS-alex — AlexNet feature stack with learned linear heads
    (Eval_utils.py:111-120); weights convert from the lpips package when
    available, otherwise the metric raises (no silent random-weight scores).
"""

from __future__ import annotations

from typing import Dict, List

import flax.linen as nn
import jax
import jax.numpy as jnp


def to_gray_uint8(img: jnp.ndarray) -> jnp.ndarray:
    """[H,W,3] float in [0,1] -> uint8 luminance like cv2 cvtColor
    (Eval_utils.py:62-64 converts uint8 BGR->gray; we assume RGB order)."""
    u8 = jnp.clip(jnp.round(img * 255.0), 0, 255)
    y = 0.299 * u8[..., 0] + 0.587 * u8[..., 1] + 0.114 * u8[..., 2]
    return jnp.round(y)


def _uniform_filter7(x: jnp.ndarray) -> jnp.ndarray:
    """7x7 moving average with valid padding, [H,W] -> [H-6,W-6]."""
    k = jnp.ones((7,), x.dtype) / 7.0
    x = jax.vmap(lambda r: jnp.convolve(r, k, mode="valid"))(x)
    x = jax.vmap(lambda c: jnp.convolve(c, k, mode="valid"), in_axes=1, out_axes=1)(x)
    return x


def ssim_gray(img1: jnp.ndarray, img2: jnp.ndarray, data_range: float = 255.0) -> jnp.ndarray:
    """skimage-compatible SSIM on 2-D grayscale arrays.

    skimage defaults: win_size=7, uniform filter, K1=.01, K2=.03, with the
    unbiased covariance normalization cov_norm = NP/(NP-1).
    """
    img1 = img1.astype(jnp.float64)
    img2 = img2.astype(jnp.float64)
    NP = 7 * 7
    cov_norm = NP / (NP - 1.0)
    ux = _uniform_filter7(img1)
    uy = _uniform_filter7(img2)
    uxx = _uniform_filter7(img1 * img1)
    uyy = _uniform_filter7(img2 * img2)
    uxy = _uniform_filter7(img1 * img2)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)
    C1 = (0.01 * data_range) ** 2
    C2 = (0.03 * data_range) ** 2
    num = (2 * ux * uy + C1) * (2 * vxy + C2)
    den = (ux ** 2 + uy ** 2 + C1) * (vx + vy + C2)
    return jnp.mean(num / den)


def ssim_rgb(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """[H,W,3] float [0,1] pair -> scalar SSIM via grayscale uint8, matching
    the reference evaluation path (Eval_utils.py:56-68)."""
    return ssim_gray(to_gray_uint8(img1), to_gray_uint8(img2))


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """cv2.PSNR on uint8-quantized [H,W,3] floats in [0,1]."""
    a = jnp.clip(jnp.round(img1 * 255.0), 0, 255)
    b = jnp.clip(jnp.round(img2 * 255.0), 0, 255)
    mse = jnp.mean((a - b) ** 2)
    return 10.0 * jnp.log10(255.0 ** 2 / jnp.maximum(mse, 1e-10))


# ---------------------------------------------------------------- LPIPS-alex


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet `.features` trunk, returning the 5 relu taps
    used by LPIPS."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> List[jnp.ndarray]:
        taps = []
        # (out_ch, kernel, stride, padding, pool_before)
        spec = [
            (64, 11, 4, 2, False),
            (192, 5, 1, 2, True),
            (384, 3, 1, 1, True),
            (256, 3, 1, 1, False),
            (256, 3, 1, 1, False),
        ]
        for i, (ch, k, s, p, pool) in enumerate(spec):
            if pool:
                x = nn.max_pool(x, (3, 3), strides=(2, 2))
            x = nn.Conv(
                ch, (k, k), strides=(s, s), padding=[(p, p), (p, p)], name=f"conv{i}"
            )(x)
            x = nn.relu(x)
            taps.append(x)
        return taps


_LPIPS_SHIFT = jnp.array([-0.030, -0.088, -0.188])
_LPIPS_SCALE = jnp.array([0.458, 0.448, 0.450])


def lpips_alex(
    params: Dict, lin_weights: List[jnp.ndarray], img1: jnp.ndarray, img2: jnp.ndarray
) -> jnp.ndarray:
    """LPIPS distance for [B,H,W,3] inputs in [0,1].

    `lin_weights[i]` is the learned [C_i] 1x1 conv weight of lpips's `lin`
    heads (convert from the lpips package checkpoint).
    """
    def norm_input(x):
        x = x * 2.0 - 1.0
        return (x - _LPIPS_SHIFT) / _LPIPS_SCALE

    net = AlexNetFeatures()
    f1 = net.apply(params, norm_input(img1))
    f2 = net.apply(params, norm_input(img2))
    total = 0.0
    for t1, t2, w in zip(f1, f2, lin_weights):
        n1 = t1 / jnp.maximum(jnp.linalg.norm(t1, axis=-1, keepdims=True), 1e-10)
        n2 = t2 / jnp.maximum(jnp.linalg.norm(t2, axis=-1, keepdims=True), 1e-10)
        d = (n1 - n2) ** 2
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total


def convert_lpips_alex(lpips_module) -> tuple:
    """Convert an instantiated `lpips.LPIPS(net='alex')` torch module to
    (flax params, lin weights)."""
    import numpy as np

    sd = {k: np.asarray(v.detach().cpu()) for k, v in lpips_module.state_dict().items()}
    conv_ids = [0, 3, 6, 8, 10]  # torchvision alexnet features conv indices
    params = {}
    for i, cid in enumerate(conv_ids):
        w = sd[f"net.slice{i+1}.{cid}.weight"]
        b = sd[f"net.slice{i+1}.{cid}.bias"]
        params[f"conv{i}"] = {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }
    lins = [
        jnp.asarray(sd[f"lin{i}.model.1.weight"][0, :, 0, 0]) for i in range(5)
    ]
    return {"params": params}, lins


def save_lpips_alex(path: str, params: Dict, lins: List[jnp.ndarray]) -> None:
    """Write converted LPIPS-alex weights as a flat .npz (the portable
    sibling of :func:`convert_lpips_alex` for images without the `lpips`
    package — run the conversion offline, ship the .npz)."""
    import numpy as np

    flat = {}
    for i in range(5):
        flat[f"conv{i}_kernel"] = np.asarray(params["params"][f"conv{i}"]["kernel"])
        flat[f"conv{i}_bias"] = np.asarray(params["params"][f"conv{i}"]["bias"])
        flat[f"lin{i}"] = np.asarray(lins[i])
    np.savez(path, **flat)


def load_lpips_alex(path: str) -> tuple:
    """Load LPIPS-alex weights for :func:`lpips_alex` from an .npz written
    by :func:`save_lpips_alex` (mirrors `load_vgg16`'s .npz acceptance so
    the CLI works without torch's `lpips` package in the image; reference
    consumer: Utils/Eval_utils.py:108-115)."""
    import numpy as np

    z = np.load(path)
    params = {
        f"conv{i}": {
            "kernel": jnp.asarray(z[f"conv{i}_kernel"]),
            "bias": jnp.asarray(z[f"conv{i}_bias"]),
        }
        for i in range(5)
    }
    lins = [jnp.asarray(z[f"lin{i}"]) for i in range(5)]
    return {"params": params}, lins
