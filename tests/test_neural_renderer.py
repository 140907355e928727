"""Neural renderer primitive parity vs torch oracles + module shape tests."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from nerf3dtalker_tpu.models.neural_renderer import (
    NeuralRenderer,
    PixelShuffleUpsample,
    bilinear_2x,
    blur3,
    pixel_shuffle_2x,
)


def _nchw(x_nhwc):
    return torch.from_numpy(np.asarray(x_nhwc)).permute(0, 3, 1, 2)


def _nhwc(x_nchw):
    return x_nchw.permute(0, 2, 3, 1).numpy()


def test_pixel_shuffle_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 4, 4, 12)).astype(np.float32)
    got = np.asarray(pixel_shuffle_2x(jnp.asarray(x)))
    want = _nhwc(F.pixel_shuffle(_nchw(x), 2))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_blur3_matches_torch_reflect_conv():
    """[1,2,1] binomial / 16, reflect padding (kornia filter2d defaults,
    PixelShuffleUpsample.py:15-18)."""
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 8, 8, 3)).astype(np.float32)
    got = np.asarray(blur3(jnp.asarray(x)))

    k1 = torch.tensor([1.0, 2.0, 1.0])
    k2 = (k1[:, None] * k1[None, :]) / 16.0
    xt = _nchw(x)
    xt = F.pad(xt, (1, 1, 1, 1), mode="reflect")
    w = k2.expand(3, 1, 3, 3).reshape(3, 1, 3, 3)
    want = _nhwc(F.conv2d(xt, w, groups=3))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_bilinear_matches_torch_align_corners_false():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 6, 6, 4)).astype(np.float32)
    got = np.asarray(bilinear_2x(jnp.asarray(x)))
    want = _nhwc(
        F.interpolate(_nchw(x), scale_factor=2, mode="bilinear", align_corners=False)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_pixel_shuffle_upsample_identity_path():
    """The module adds the 4x channel-tiled input before shuffling
    (PixelShuffleUpsample.py:37-42); with zeroed convs the output is the
    blurred nearest-upsample of x."""
    m = PixelShuffleUpsample(features=8)
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 4, 4, 8)).astype(np.float32))
    params = m.init(jax.random.key(0), x)
    params = jax.tree.map(jnp.zeros_like, params)
    out = m.apply(params, x)
    assert out.shape == (1, 8, 8, 8)
    # identity path oracle in torch: y = x.repeat(1,4,1,1); pixel_shuffle;
    # blur. (The channel-block tiling deliberately mixes channels across
    # subpixels — a reference quirk we reproduce bit-for-bit.)
    y = _nchw(np.asarray(x)).repeat(1, 4, 1, 1)
    want = _nhwc(F.pixel_shuffle(y, 2))
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(blur3(jnp.asarray(want))), atol=1e-6
    )


def test_neural_renderer_shapes_and_bg():
    m = NeuralRenderer(feat_nc=64, featmap_size=8, img_size=32, min_feat=16)
    x = jnp.ones((2, 8, 8, 64))
    params = m.init(jax.random.key(0), x)
    out = m.apply(params, x)
    assert out.shape == (2, 32, 32, 3)
    assert np.all(np.asarray(out) >= 0) and np.all(np.asarray(out) <= 1)
    bg = m.apply(params, method=m.bg_featmap)
    assert bg.shape == (1, 8, 8, 64)
    np.testing.assert_allclose(np.asarray(bg), 1.0)  # white bg init
