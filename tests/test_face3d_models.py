"""BFM parametric model, recon nets, and arcface backbone tests."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf3dtalker_tpu.models.face3d.bfm import (
    compute_color,
    compute_for_render,
    compute_norm,
    compute_rotation,
    compute_shape,
    split_coeff,
    synthetic_bfm,
    to_camera,
    to_image,
)
from nerf3dtalker_tpu.models.resnets import IResNet, ReconNet


def test_split_coeff_layout():
    c = jnp.arange(257.0)[None]
    d = split_coeff(c)
    assert d["id"].shape == (1, 80)
    assert d["exp"].shape == (1, 64)
    assert float(d["exp"][0, 0]) == 80.0       # exp slice starts at 80
    assert float(d["trans"][0, 0]) == 254.0


def test_rotation_is_transposed_orthonormal():
    R = compute_rotation(jnp.asarray([[0.2, -0.3, 0.1]]))
    M = np.asarray(R[0])
    np.testing.assert_allclose(M @ M.T, np.eye(3), atol=1e-6)
    # zero angles -> identity
    R0 = compute_rotation(jnp.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(R0[0]), np.eye(3), atol=1e-6)


def test_bfm_render_decode():
    bfm = synthetic_bfm()
    coeffs = jnp.asarray(
        np.random.default_rng(0).standard_normal((2, 257)).astype(np.float32) * 0.1
    )
    verts, tex, color, lm = compute_for_render(bfm, coeffs)
    assert verts.shape == (2, 64, 3)
    assert tex.shape == (2, 64, 3)
    assert color.shape == (2, 64, 3)
    assert lm.shape == (2, 68, 2)
    assert np.isfinite(np.asarray(color)).all()
    # camera-space z near camera_distance
    assert abs(float(jnp.mean(verts[..., 2])) - 10.0) < 2.0


def test_bfm_norms_unit():
    bfm = synthetic_bfm()
    shape = compute_shape(bfm, jnp.zeros((1, 80)), jnp.zeros((1, 64)))
    n = compute_norm(bfm, shape)
    norms = np.linalg.norm(np.asarray(n[0]), axis=-1)
    ok = norms > 1e-3  # degenerate random faces may cancel
    np.testing.assert_allclose(norms[ok], 1.0, atol=1e-4)


def test_recon_net_and_iresnet():
    m = ReconNet()
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.key(0), x)
    out = m.apply(v, x)
    assert out.shape == (1, 257)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)  # zero-init fc

    ir = IResNet(layers=(1, 1, 1, 1), input_size=32)
    xi = jnp.zeros((2, 32, 32, 3))
    vi = ir.init(jax.random.key(0), xi)
    emb = ir.apply(vi, xi)
    assert emb.shape == (2, 512)


def test_mobilefacenet_shapes_and_depthwise():
    from nerf3dtalker_tpu.models.resnets import MobileFaceNet

    m = MobileFaceNet()
    x = jnp.zeros((2, 112, 112, 3))
    v = m.init(jax.random.key(0), x)
    emb = m.apply(v, x)
    assert emb.shape == (2, 512)
    # the GDC head must be a global depthwise conv: kernel spatial dims
    # cover the full 7x7 final feature map and in-ch/groups == 1
    gdc = v["params"]["gdc"]["conv"]["kernel"]
    assert gdc.shape == (7, 7, 1, 512)
    # depthwise stage convs are grouped (in-ch per group == 1)
    dw = v["params"]["down1"]["dw"]["conv"]["kernel"]
    assert dw.shape[2] == 1 and dw.shape[3] == 128
    # param count is mobile-scale (reference mbf ~= 2M params)
    n = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(v["params"]))
    assert 1_000_000 < n < 4_000_000

    # train-mode call updates batch stats
    out, new_vars = m.apply(v, jnp.ones((1, 112, 112, 3)), train=True,
                            mutable=["batch_stats"])
    assert out.shape == (1, 512)
