"""BFM09 parametric face model (Deep3DFaceRecon / SadTalker stack).

Equivalent of reference `s_face3d/models/bfm.py:26-330` ParametricFaceModel:
PCA shape/expression/texture bases, vertex normals via face/point buffers,
3-band SH color, euler rotation (transposed — points are row vectors,
`pts @ R`), fixed-distance camera, perspective projection, 68 keypoints,
and the 257-coeff split (id80|exp64|tex80|angle3|gamma27|trans3,
bfm.py:253-274 — the `exp` slice is what SadTalker/NeRF-3DTalker feed into
the NeRF expression code, talker_trainer.py:164-185 split_coeff).

Basis arrays come from the user-supplied BFM .mat (see `load_bfm`); the
math is pure jnp and works with any consistent basis set.
"""

from __future__ import annotations

from typing import Dict, NamedTuple

import jax.numpy as jnp
import numpy as np


class BFM(NamedTuple):
    mean_shape: jnp.ndarray   # [3N]
    id_base: jnp.ndarray      # [3N, 80]
    exp_base: jnp.ndarray     # [3N, 64]
    mean_tex: jnp.ndarray     # [3N]
    tex_base: jnp.ndarray     # [3N, 80]
    faces: jnp.ndarray        # [F, 3] int32 (face_buf)
    point_buf: jnp.ndarray    # [N, 8] faces adjacent to each vertex
    keypoints: jnp.ndarray    # [68] vertex ids
    camera_distance: float = 10.0
    focal: float = 1015.0
    center: float = 112.0


# SH constants (bfm.py SH class)
_SH_A = np.array([np.pi, 2 * np.pi / np.sqrt(3.0), 2 * np.pi / np.sqrt(8.0)])
_SH_C = np.array(
    [1 / np.sqrt(4 * np.pi), np.sqrt(3.0) / np.sqrt(4 * np.pi),
     3 * np.sqrt(5.0) / np.sqrt(12 * np.pi)]
)
_INIT_LIT = np.array([0.8, 0, 0, 0, 0, 0, 0, 0, 0], np.float32)


def split_coeff(coeffs: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """[B, 257] -> dict (bfm.py:253-274)."""
    return {
        "id": coeffs[:, :80],
        "exp": coeffs[:, 80:144],
        "tex": coeffs[:, 144:224],
        "angle": coeffs[:, 224:227],
        "gamma": coeffs[:, 227:254],
        "trans": coeffs[:, 254:257],
    }


def compute_shape(bfm: BFM, id_coeff, exp_coeff):
    """[B,80],[B,64] -> [B,N,3] (bfm.py:87-101)."""
    B = id_coeff.shape[0]
    s = (
        jnp.einsum("ij,aj->ai", bfm.id_base, id_coeff)
        + jnp.einsum("ij,aj->ai", bfm.exp_base, exp_coeff)
        + bfm.mean_shape
    )
    return s.reshape(B, -1, 3)


def compute_texture(bfm: BFM, tex_coeff, normalize=True):
    B = tex_coeff.shape[0]
    t = jnp.einsum("ij,aj->ai", bfm.tex_base, tex_coeff) + bfm.mean_tex
    if normalize:
        t = t / 255.0
    return t.reshape(B, -1, 3)


def compute_norm(bfm: BFM, face_shape):
    """Vertex normals via the precomputed per-vertex face list
    (bfm.py:118-139)."""
    v1 = face_shape[:, bfm.faces[:, 0]]
    v2 = face_shape[:, bfm.faces[:, 1]]
    v3 = face_shape[:, bfm.faces[:, 2]]
    fn = jnp.cross(v1 - v2, v2 - v3)
    fn = fn / jnp.maximum(jnp.linalg.norm(fn, axis=-1, keepdims=True), 1e-8)
    fn = jnp.concatenate([fn, jnp.zeros_like(fn[:, :1])], axis=1)
    vn = jnp.sum(fn[:, bfm.point_buf], axis=2)
    return vn / jnp.maximum(jnp.linalg.norm(vn, axis=-1, keepdims=True), 1e-8)


def compute_color(face_texture, face_norm, gamma):
    """3x9 SH shading (bfm.py:141-173): gamma [B,27] laid out [3 chan x 9]."""
    B = gamma.shape[0]
    g = gamma.reshape(B, 3, 9) + _INIT_LIT
    g = jnp.transpose(g, (0, 2, 1))                       # [B, 9, 3]
    a, c = _SH_A, _SH_C
    n = face_norm
    ones = jnp.ones_like(n[..., :1])
    Y = jnp.concatenate(
        [
            a[0] * c[0] * ones,
            -a[1] * c[1] * n[..., 1:2],
            a[1] * c[1] * n[..., 2:],
            -a[1] * c[1] * n[..., :1],
            a[2] * c[2] * n[..., :1] * n[..., 1:2],
            -a[2] * c[2] * n[..., 1:2] * n[..., 2:],
            0.5 * a[2] * c[2] / np.sqrt(3.0) * (3 * n[..., 2:] ** 2 - 1),
            -a[2] * c[2] * n[..., :1] * n[..., 2:],
            0.5 * a[2] * c[2] * (n[..., :1] ** 2 - n[..., 1:2] ** 2),
        ],
        axis=-1,
    )  # [B, N, 9]
    light = jnp.einsum("bnk,bkc->bnc", Y, g)
    return light * face_texture


def compute_rotation(angles):
    """[B, 3] radians -> [B, 3, 3] transposed rotation (points are row
    vectors: pts @ R; bfm.py:175-208)."""
    x, y, z = angles[:, 0], angles[:, 1], angles[:, 2]
    o = jnp.ones_like(x)
    zr = jnp.zeros_like(x)
    rx = jnp.stack([o, zr, zr, zr, jnp.cos(x), -jnp.sin(x), zr, jnp.sin(x), jnp.cos(x)], 1).reshape(-1, 3, 3)
    ry = jnp.stack([jnp.cos(y), zr, jnp.sin(y), zr, o, zr, -jnp.sin(y), zr, jnp.cos(y)], 1).reshape(-1, 3, 3)
    rz = jnp.stack([jnp.cos(z), -jnp.sin(z), zr, jnp.sin(z), jnp.cos(z), zr, zr, zr, o], 1).reshape(-1, 3, 3)
    return jnp.transpose(rz @ ry @ rx, (0, 2, 1))


def to_camera(bfm: BFM, face_shape):
    """z -> camera_distance - z (bfm.py:211-213)."""
    return face_shape.at[..., 2].set(bfm.camera_distance - face_shape[..., 2])


def to_image(bfm: BFM, face_shape):
    """Perspective projection with focal/center (bfm.py:215-226)."""
    proj = np.array(
        [[bfm.focal, 0, bfm.center], [0, bfm.focal, bfm.center], [0, 0, 1]],
        np.float32,
    ).T
    p = face_shape @ jnp.asarray(proj)
    return p[..., :2] / p[..., 2:]


def compute_for_render(bfm: BFM, coeffs: jnp.ndarray):
    """Full decode (bfm.py:275-300): returns (verts_cam, texture, color,
    landmarks68)."""
    c = split_coeff(coeffs)
    shape = compute_shape(bfm, c["id"], c["exp"])
    rot = compute_rotation(c["angle"])
    shape_t = shape @ rot + c["trans"][:, None]
    verts_cam = to_camera(bfm, shape_t)
    proj = to_image(bfm, verts_cam)
    lm = proj[:, bfm.keypoints]
    tex = compute_texture(bfm, c["tex"])
    norm = compute_norm(bfm, shape)
    color = compute_color(tex, norm @ rot, c["gamma"])
    return verts_cam, tex, color, lm


def load_bfm(mat_path: str) -> BFM:
    """Load BFM09 arrays from the Deep3DFaceRecon `BFM_model_front.mat`
    (s_face3d/util/load_mats.py)."""
    from scipy.io import loadmat

    m = loadmat(mat_path)
    return BFM(
        mean_shape=jnp.asarray(m["meanshape"].astype(np.float32).reshape(-1)),
        id_base=jnp.asarray(m["idBase"].astype(np.float32)),
        exp_base=jnp.asarray(m["exBase"].astype(np.float32)),
        mean_tex=jnp.asarray(m["meantex"].astype(np.float32).reshape(-1)),
        tex_base=jnp.asarray(m["texBase"].astype(np.float32)),
        faces=jnp.asarray(m["tri"].astype(np.int64).reshape(-1, 3) - 1),
        point_buf=jnp.asarray(m["point_buf"].astype(np.int64) - 1),
        keypoints=jnp.asarray(np.squeeze(m["keypoints"]).astype(np.int64) - 1),
    )


def synthetic_bfm(n_verts: int = 64, n_faces: int = 100, seed: int = 0) -> BFM:
    """Random small BFM for tests."""
    rng = np.random.default_rng(seed)
    faces = rng.integers(0, n_verts, (n_faces, 3)).astype(np.int32)
    point_buf = rng.integers(0, n_faces, (n_verts, 8)).astype(np.int32)
    return BFM(
        mean_shape=jnp.asarray(rng.standard_normal(3 * n_verts).astype(np.float32)),
        id_base=jnp.asarray(rng.standard_normal((3 * n_verts, 80)).astype(np.float32) * 0.01),
        exp_base=jnp.asarray(rng.standard_normal((3 * n_verts, 64)).astype(np.float32) * 0.01),
        mean_tex=jnp.asarray(np.full(3 * n_verts, 128.0, np.float32)),
        tex_base=jnp.asarray(rng.standard_normal((3 * n_verts, 80)).astype(np.float32)),
        faces=jnp.asarray(faces),
        point_buf=jnp.asarray(point_buf),
        keypoints=jnp.asarray(rng.integers(0, n_verts, 68).astype(np.int32)),
    )
