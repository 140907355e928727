"""Differentiable mesh rasterizer (pure JAX — replaces pytorch3d).

The reference depends on pytorch3d's CUDA `MeshRasterizer` in three places
(SURVEY.md §2.10): `Fitting3DMM/NL3DMMRenderer.py:138-214` (hard raster,
faces_per_pixel=1, blur 0), `s_face3d/util/nvdiffrast.py:32-130`, and
`lipsrc/utils/renderer.py`. This module implements the same contract
TPU-natively:

  * a chunked z-buffer pass (lax.scan over face chunks — dense per-pixel
    per-face edge tests on the VPU, O(H*W*F_chunk) working set) finds the
    nearest covering face per pixel;
  * attributes are then interpolated with *differentiably recomputed*
    barycentrics of the winning face — gradients flow to vertex positions
    and attributes exactly like pytorch3d's hard rasterization path.

Convention: camera space with +z into the screen; perspective projection
uv = K @ (x/z, y/z, 1) matching `calc_ProjUV` (NL3DMMRenderer.py:129-136).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp


class RasterResult(NamedTuple):
    face_idx: jnp.ndarray   # [B, H, W] int32, -1 = background
    bary: jnp.ndarray       # [B, H, W, 3] differentiable barycentrics
    zbuf: jnp.ndarray       # [B, H, W]
    mask: jnp.ndarray       # [B, H, W] float 0/1


def project_perspective(verts_cam: jnp.ndarray, inmat: jnp.ndarray) -> jnp.ndarray:
    """[B, V, 3] camera-space -> [B, V, 3] (x_pix, y_pix, z)
    (NL3DMMRenderer.py:129-136 calc_ProjUV, keeping z)."""
    z = verts_cam[..., 2:3] + 1e-7
    uv1 = verts_cam / z
    uv = jnp.einsum("bij,bvj->bvi", inmat, uv1)
    return jnp.concatenate([uv[..., :2], verts_cam[..., 2:3]], axis=-1)


def _edge(ax, ay, bx, by, px, py):
    """Signed area edge function: cross(b - a, p - a)."""
    return (bx - ax) * (py - ay) - (by - ay) * (px - ax)


@functools.partial(jax.jit, static_argnames=("H", "W", "chunk"))
def rasterize_mesh(
    verts_screen: jnp.ndarray,   # [B, V, 3] (x_pix, y_pix, z)
    faces: jnp.ndarray,          # [F, 3] int32
    H: int,
    W: int,
    chunk: int = 512,
) -> RasterResult:
    """Z-buffer rasterization. Non-differentiable winner search (the
    argmin), differentiable barycentric recomputation for the winner."""
    B, V, _ = verts_screen.shape
    F = faces.shape[0]
    pad = (-F) % chunk
    faces_p = jnp.pad(faces, ((0, pad), (0, 0)))            # padded with face 0
    valid_f = jnp.pad(jnp.ones((F,), bool), (0, pad))
    n_chunks = faces_p.shape[0] // chunk

    ys, xs = jnp.mgrid[0:H, 0:W]
    px = (xs + 0.5).reshape(-1).astype(verts_screen.dtype)   # pixel centers
    py = (ys + 0.5).reshape(-1).astype(verts_screen.dtype)

    vs = jax.lax.stop_gradient(verts_screen)

    def per_batch(vb):
        def body(carry, ci):
            best_z, best_i = carry
            f = jax.lax.dynamic_slice(faces_p, (ci * chunk, 0), (chunk, 3))
            fv = jnp.take(vb, f.reshape(-1), axis=0).reshape(chunk, 3, 3)
            v0, v1, v2 = fv[:, 0], fv[:, 1], fv[:, 2]
            # [P, C] edge functions
            e0 = _edge(v1[:, 0], v1[:, 1], v2[:, 0], v2[:, 1], px[:, None], py[:, None])
            e1 = _edge(v2[:, 0], v2[:, 1], v0[:, 0], v0[:, 1], px[:, None], py[:, None])
            e2 = _edge(v0[:, 0], v0[:, 1], v1[:, 0], v1[:, 1], px[:, None], py[:, None])
            area = e0 + e1 + e2
            # two-sided coverage: all same sign, non-degenerate
            pos = (e0 >= 0) & (e1 >= 0) & (e2 >= 0)
            neg = (e0 <= 0) & (e1 <= 0) & (e2 <= 0)
            inside = (pos | neg) & (jnp.abs(area) > 1e-9)
            w0 = e0 / jnp.where(jnp.abs(area) > 1e-9, area, 1.0)
            w1 = e1 / jnp.where(jnp.abs(area) > 1e-9, area, 1.0)
            w2 = 1.0 - w0 - w1
            z = w0 * v0[:, 2] + w1 * v1[:, 2] + w2 * v2[:, 2]
            front = z > 1e-6                                  # behind camera culled
            vf = jax.lax.dynamic_slice(valid_f, (ci * chunk,), (chunk,))
            ok = inside & front & vf[None, :]
            z = jnp.where(ok, z, jnp.inf)
            ci_best = jnp.argmin(z, axis=-1)                  # [P]
            z_best = jnp.take_along_axis(z, ci_best[:, None], axis=-1)[:, 0]
            gid = ci * chunk + ci_best
            upd = z_best < best_z
            return (
                jnp.where(upd, z_best, best_z),
                jnp.where(upd, gid, best_i),
            ), None

        init = (jnp.full((H * W,), jnp.inf, vb.dtype), jnp.full((H * W,), -1, jnp.int32))
        (zb, fi), _ = jax.lax.scan(body, init, jnp.arange(n_chunks))
        return zb, fi

    zbuf, face_idx = jax.vmap(per_batch)(vs)

    # differentiable barycentrics of the winning face
    safe_idx = jnp.maximum(face_idx, 0)                               # [B, P]
    fvi = jnp.take(faces_p, safe_idx, axis=0)                         # [B,P,3]
    fv = jax.vmap(lambda vb, ib: jnp.take(vb, ib.reshape(-1), axis=0))(
        verts_screen, fvi
    ).reshape(B, H * W, 3, 3)
    v0, v1, v2 = fv[:, :, 0], fv[:, :, 1], fv[:, :, 2]
    e0 = _edge(v1[..., 0], v1[..., 1], v2[..., 0], v2[..., 1], px, py)
    e1 = _edge(v2[..., 0], v2[..., 1], v0[..., 0], v0[..., 1], px, py)
    e2 = _edge(v0[..., 0], v0[..., 1], v1[..., 0], v1[..., 1], px, py)
    area = e0 + e1 + e2
    denom = jnp.where(jnp.abs(area) > 1e-9, area, 1.0)
    bary = jnp.stack([e0 / denom, e1 / denom, e2 / denom], axis=-1)

    hit = (face_idx >= 0).reshape(B, H * W)
    bary = jnp.where(hit[..., None], bary, 0.0).reshape(B, H, W, 3)
    return RasterResult(
        face_idx=face_idx.reshape(B, H, W),
        bary=bary,
        zbuf=jnp.where(hit, zbuf.reshape(B, -1), 0.0).reshape(B, H, W),
        mask=hit.astype(verts_screen.dtype).reshape(B, H, W),
    )


def interpolate_attributes(
    raster: RasterResult,
    faces: jnp.ndarray,          # [F, 3]
    attrs: jnp.ndarray,          # [B, V, C] per-vertex attributes
) -> jnp.ndarray:
    """Barycentric attribute interpolation (the pytorch3d
    `interpolate_face_attributes` equivalent). [B, H, W, C]."""
    B, H, W = raster.face_idx.shape
    safe = jnp.maximum(raster.face_idx.reshape(B, -1), 0)
    fvi = jnp.take(faces, safe, axis=0)                       # [B, P, 3]
    fa = jax.vmap(lambda ab, ib: jnp.take(ab, ib.reshape(-1), axis=0))(
        attrs, fvi
    ).reshape(B, H * W, 3, attrs.shape[-1])
    out = jnp.einsum("bpk,bpkc->bpc", raster.bary.reshape(B, -1, 3), fa)
    out = out * raster.mask.reshape(B, -1, 1)
    return out.reshape(B, H, W, attrs.shape[-1])


def render_mesh(
    verts_cam: jnp.ndarray,      # [B, V, 3]
    faces: jnp.ndarray,          # [F, 3]
    attrs: jnp.ndarray,          # [B, V, C] (e.g. SH-lit vertex colors)
    inmat: jnp.ndarray,          # [B, 3, 3]
    H: int,
    W: int,
    background: float = 0.0,
    chunk: int = 512,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full render: project -> rasterize -> interpolate. Returns
    (image [B,H,W,C], mask [B,H,W]) with constant background
    (blending.BlendParams(background_color=0), NL3DMMRenderer.py:196)."""
    screen = project_perspective(verts_cam, inmat)
    raster = rasterize_mesh(screen, faces, H, W, chunk=chunk)
    img = interpolate_attributes(raster, faces, attrs)
    img = img + (1.0 - raster.mask[..., None]) * background
    return img, raster.mask


def vertex_normals(verts: jnp.ndarray, faces: jnp.ndarray) -> jnp.ndarray:
    """Area-weighted vertex normals [B, V, 3] (NL3DMMRenderer normals for
    SH shading)."""
    B, V, _ = verts.shape
    fv = jnp.take(verts, faces.reshape(-1), axis=1).reshape(B, -1, 3, 3)
    n = jnp.cross(fv[:, :, 1] - fv[:, :, 0], fv[:, :, 2] - fv[:, :, 0])
    out = jnp.zeros_like(verts)
    for k in range(3):
        out = out.at[:, faces[:, k]].add(n)
    norm = jnp.linalg.norm(out, axis=-1, keepdims=True)
    return out / jnp.maximum(norm, 1e-8)
