"""Nonlinear 3DMM decoder, SH lighting, and the differentiable mesh render.

Equivalents of reference `Fitting3DMM/FaceModels.py:8-126` (NonLinear_3DMM
geometry MLP + Linear_3DMM PCA texture over 34650 points) and
`Fitting3DMM/NL3DMMRenderer.py:16-379` (geometry decode -> normals -> SH
lighting -> pytorch3d raster; landmark projection RenderUtils.py:59-92) —
with the rasterization done by the pure-JAX rasterizer in this package.

Basis data (`ConfigModels/nl3dmm_dict.pkl` with mu/b/sig_* arrays and the
decoder weights `nl3dmm_net_dict.pth`) is user-supplied at runtime; the
module is structured so converted reference weights drop in 1:1.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from nerf3dtalker_tpu.models.face3d.rasterizer import (
    project_perspective,
    render_mesh,
    vertex_normals,
)

POINT_NUM = 34650   # FaceModels.py:33


class NonLinear3DMM(nn.Module):
    """iden(100)+expr(79) -> vertices [B, V, 3]
    (FaceModels.py:24-62: Linear(179,1024) -> ReLU -> Linear(1024, 3V);
    the second layer is initialized from the PCA basis mu/b)."""

    point_num: int = POINT_NUM
    code_dims: int = 179

    @nn.compact
    def __call__(self, iden_code, expr_code, scale: float = 1.0):
        x = jnp.concatenate([iden_code, expr_code], axis=-1)
        x = nn.relu(nn.Dense(1024, name="geo_fc2")(x))
        geo = nn.Dense(3 * self.point_num, name="geo_fc3")(x)
        return geo.reshape(-1, self.point_num, 3) * scale


class Linear3DMMTexture(nn.Module):
    """PCA texture: tex = (norm_code * sig_tex) @ b_tex + mu_tex
    (FaceModels.py:77-126)."""

    point_num: int = POINT_NUM
    tex_dims: int = 100

    @nn.compact
    def __call__(self, norm_tex_code):
        b_tex = self.param(
            "b_tex", nn.initializers.normal(0.01),
            (self.tex_dims, 3 * self.point_num),
        )
        mu_tex = self.param(
            "mu_tex", nn.initializers.constant(0.5), (3 * self.point_num,)
        )
        sig_tex = self.param(
            "sig_tex", nn.initializers.ones, (self.tex_dims,)
        )
        tex = (norm_tex_code * sig_tex) @ b_tex + mu_tex
        return tex.reshape(-1, self.point_num, 3)


# SH band constants (NL3DMMRenderer.py:71-92 a0..d0)
_A0 = np.pi
_A1 = 2 * np.pi / np.sqrt(3.0)
_A2 = 2 * np.pi / np.sqrt(8.0)
_C0 = 1.0 / np.sqrt(4 * np.pi)
_C1 = np.sqrt(3.0) / np.sqrt(4 * np.pi)
_C2 = 3 * np.sqrt(5.0) / np.sqrt(12 * np.pi)
_D0 = 0.5 / np.sqrt(3.0)


def sh_lighting(vcolor: jnp.ndarray, normals: jnp.ndarray, gamma: jnp.ndarray):
    """9-band SH shading (NL3DMMRenderer.py build_color :94-128):
    vcolor [B or 1, V, 3]; normals [B, V, 3]; gamma [B, 27] -> [B, V, 3]."""
    B, V, _ = normals.shape
    g = gamma.reshape(-1, 9, 3)
    nx, ny, nz = normals[..., 0], normals[..., 1], normals[..., 2]
    Y = jnp.stack(
        [
            jnp.ones_like(nx) * _A0 * _C0,
            -_A1 * _C1 * ny,
            _A1 * _C1 * nz,
            -_A1 * _C1 * nx,
            _A2 * _C2 * nx * ny,
            -_A2 * _C2 * ny * nz,
            _A2 * _C2 * _D0 * (3 * nz ** 2 - 1),
            -_A2 * _C2 * nx * nz,
            _A2 * _C2 * 0.5 * (nx ** 2 - ny ** 2),
        ],
        axis=-1,
    )  # [B, V, 9]
    lighting = jnp.einsum("bvk,bkc->bvc", Y, g)
    return vcolor * lighting


class NL3DMMRenderResult(NamedTuple):
    image: jnp.ndarray      # [B, H, W, 3]
    mask: jnp.ndarray       # [B, H, W]
    lm2d: jnp.ndarray       # [B, L, 2] projected landmarks
    verts_cam: jnp.ndarray  # [B, V, 3]


def render_nl3dmm(
    geo_params,
    tex_params,
    iden_code, expr_code, text_code, gamma,
    w2c_Rmat, w2c_Tvec, inmat,
    faces: jnp.ndarray,
    lm_index: jnp.ndarray,
    H: int, W: int,
    chunk: int = 512,
) -> NL3DMMRenderResult:
    """Full differentiable 3DMM render (NL3DMMRenderer.forward :216-379):
    decode geometry + texture, transform world->cam, SH shade, rasterize,
    project landmarks. The mesh size is read off the param shapes, so
    reduced meshes (tests, build_appliers) need no module patching."""
    pn_geo = geo_params["params"]["geo_fc3"]["bias"].shape[-1] // 3
    pn_tex = tex_params["params"]["mu_tex"].shape[-1] // 3
    geo = NonLinear3DMM(point_num=pn_geo).apply(geo_params, iden_code, expr_code)
    tex = Linear3DMMTexture(point_num=pn_tex).apply(tex_params, text_code)

    verts_cam = jnp.einsum("bij,bvj->bvi", w2c_Rmat, geo) + w2c_Tvec[:, None, :]
    normals = vertex_normals(verts_cam, faces)
    colors = sh_lighting(tex, normals, gamma)

    img, mask = render_mesh(verts_cam, faces, colors, inmat, H, W, chunk=chunk)

    screen = project_perspective(verts_cam, inmat)
    lm2d = jnp.take(screen[..., :2], lm_index, axis=1)
    return NL3DMMRenderResult(image=img, mask=mask, lm2d=lm2d, verts_cam=verts_cam)


def load_nl3dmm_basis(pkl_path: str, net_dict: Optional[dict] = None) -> Dict:
    """Load the reference basis pickle (`ConfigModels/nl3dmm_dict.pkl`,
    FaceModels.py:9-21) — and optionally the decoder state_dict
    (`nl3dmm_net_dict.pth`) — into flax param trees.

    geo_fc3 init mirrors FaceModels.py:37-43: bias = mu; kernel rows
    0:179 = b ([179, 3V]); rows 179:500 = 0.001; rest random-small.
    """
    import pickle

    with open(pkl_path, "rb") as f:
        d = pickle.load(f)
    mu = np.asarray(d["mu"], np.float32)
    b = np.asarray(d["b"], np.float32)
    if b.shape[0] != 179:
        b = b.T
    out_dim = mu.shape[0]
    k3 = np.random.default_rng(0).normal(0, 1e-4, (1024, out_dim)).astype(np.float32)
    k3[:179] = b
    k3[179:500] = 1e-3
    k2 = np.random.default_rng(1).normal(0, 0.02, (179, 1024)).astype(np.float32)
    b2 = np.zeros((1024,), np.float32)
    if net_dict is not None:  # converted torch weights win
        if "geo_fc2.weight" in net_dict:
            k2 = np.asarray(net_dict["geo_fc2.weight"]).T
            b2 = np.asarray(net_dict["geo_fc2.bias"])
        if "geo_fc3.weight" in net_dict:
            k3 = np.asarray(net_dict["geo_fc3.weight"]).T
            mu = np.asarray(net_dict["geo_fc3.bias"])
    geo = {
        "params": {
            "geo_fc2": {"kernel": jnp.asarray(k2), "bias": jnp.asarray(b2)},
            "geo_fc3": {"kernel": jnp.asarray(k3), "bias": jnp.asarray(mu)},
        }
    }
    tex = {
        "params": {
            "b_tex": jnp.asarray(np.asarray(d["b_tex"], np.float32)),
            "mu_tex": jnp.asarray(np.asarray(d["mu_tex"], np.float32)),
            "sig_tex": jnp.asarray(np.asarray(d["sig_tex"], np.float32)),
        }
    }
    return {"geo": geo, "tex": tex}
