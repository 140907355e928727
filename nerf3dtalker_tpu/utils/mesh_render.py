"""Mesh-sequence offscreen rendering (demo/render equivalent).

Equivalent of reference `StandardizedSpace/main/demo.py:22-28,108-219` and
`render.py:21-143` (pyrender+trimesh offscreen video of predicted vertex
sequences), re-built on the package's differentiable rasterizer.

Lighting parity note: the reference adds FIVE pyrender DirectionalLights
"rotated" ±30° (render.py:93-112) — but pyrender directional lights shine
along the -z axis of their POSE ROTATION, and the reference only ever
sets the pose *translation*, so all five are identical headlights along
-z. Its effective shading is therefore ambient(0.2, render.py:73-75) +
a strong -z headlight on a metallic-roughness material (base 0.3,
metallic 0.8, roughness 0.8, render.py:40-45). That model — ambient +
Lambert headlight + Blinn specular lobe (view == light == -z, so the
half-vector is -z too) — is what `shade_headlight` implements.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def shade_headlight(
    normals,                     # [B, V, 3]
    base_color=(0.3, 0.3, 0.3),  # render.py:42 baseColorFactor
    ambient: float = 0.2,        # render.py:73 ambient_light
    diffuse: float = 1.0,
    specular: float = 0.8,       # metallicFactor 0.8 -> specular-dominant
    shininess: float = 8.0,      # roughnessFactor 0.8 -> broad lobe
):
    """Per-vertex RGB under the reference's effective light rig (see
    module docstring). Returns [B, V, 3]."""
    import jax.numpy as jnp

    base = jnp.asarray(np.asarray(base_color, np.float32))
    ndotl = jnp.clip(-normals[..., 2:3], 0.0, 1.0)   # light dir = -z
    # Blinn: view == light == -z  =>  half vector == -z  =>  n.h == n.l
    spec = specular * ndotl**shininess
    return jnp.clip(base * (ambient + diffuse * ndotl) + spec, 0.0, 1.0)


def render_mesh_sequence(
    verts_seq: np.ndarray,        # [T, V, 3] (model/world space)
    faces: np.ndarray,            # [F, 3]
    image_size: int = 256,
    camera_distance: float = 2.5,
    focal: float = 400.0,
    color: tuple = (0.75, 0.75, 0.8),
    out_path: Optional[str] = None,
    fps: int = 25,
    chunk: int = 512,
    rot: Optional[np.ndarray] = None,   # [3] axis-angle world rotation
                                        # (render.py:44 Rodrigues support)
    background: float = 1.0,            # 1=white, 0=black (render.py:73-76)
    shading: str = "headlight",         # "headlight" (reference rig) or
                                        # "lambert" (plain clip shading)
) -> np.ndarray:
    """Returns [T, H, W, 3] frames; writes video when out_path given."""
    import jax.numpy as jnp

    from nerf3dtalker_tpu.models.face3d.rasterizer import (
        render_mesh,
        vertex_normals,
    )
    from nerf3dtalker_tpu.models.flame import batch_rodrigues

    faces_j = jnp.asarray(faces.astype(np.int32))
    K = jnp.asarray(
        np.array(
            [[focal, 0, image_size / 2], [0, focal, image_size / 2], [0, 0, 1]],
            np.float32,
        )[None]
    )
    R = None
    if rot is not None and np.any(np.asarray(rot)):
        R = batch_rodrigues(jnp.asarray(rot, jnp.float32)[None])[0]
    frames = []
    base = jnp.asarray(np.asarray(color, np.float32))
    for t in range(len(verts_seq)):
        v = jnp.asarray(verts_seq[t][None].astype(np.float32))
        # center (+optional Rodrigues rotation about the center,
        # render_mesh_helper render.py:44) + push in front of the camera
        v = v - jnp.mean(v, axis=1, keepdims=True)
        if R is not None:
            v = jnp.einsum("ij,bvj->bvi", R, v)
        v = v.at[..., 2].add(camera_distance)
        n = vertex_normals(v, faces_j)
        if shading == "headlight":
            # tint rides the ambient+diffuse term inside shade_headlight;
            # the metallic specular lobe stays untinted (pyrender's
            # baseColor override does not recolor the highlight)
            attrs = shade_headlight(n, base_color=tuple(np.asarray(color)))
        else:
            shade = jnp.clip(-n[..., 2:3], 0.2, 1.0)
            attrs = base * shade
        img, _ = render_mesh(v, faces_j, jnp.clip(attrs, 0.0, 1.0), K,
                             image_size, image_size,
                             background=background, chunk=chunk)
        frames.append(np.asarray(img[0]))
    frames = np.stack(frames)
    if out_path:
        from nerf3dtalker_tpu.utils.video import write_video

        write_video(frames, out_path, fps=fps)
    return frames
