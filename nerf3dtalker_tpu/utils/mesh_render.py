"""Mesh-sequence offscreen rendering (demo/render equivalent).

Equivalent of reference `StandardizedSpace/main/demo.py:22-28,108-219` and
`render.py:21-203` (pyrender+trimesh offscreen video of predicted vertex
sequences): renders each frame's mesh with the package's differentiable
rasterizer under a simple headlight shading, writes an mp4 via ffmpeg.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


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
) -> np.ndarray:
    """Returns [T, H, W, 3] frames; writes video when out_path given."""
    import jax.numpy as jnp

    from nerf3dtalker_tpu.models.face3d.rasterizer import (
        render_mesh,
        vertex_normals,
    )

    faces_j = jnp.asarray(faces.astype(np.int32))
    K = jnp.asarray(
        np.array(
            [[focal, 0, image_size / 2], [0, focal, image_size / 2], [0, 0, 1]],
            np.float32,
        )[None]
    )
    frames = []
    base = jnp.asarray(np.asarray(color, np.float32))
    for t in range(len(verts_seq)):
        v = jnp.asarray(verts_seq[t][None].astype(np.float32))
        # center + push in front of the camera
        v = v - jnp.mean(v, axis=1, keepdims=True)
        v = v.at[..., 2].add(camera_distance)
        n = vertex_normals(v, faces_j)
        # headlight lambert: light along -z
        shade = jnp.clip(-n[..., 2:3], 0.2, 1.0)
        attrs = base * shade
        img, _ = render_mesh(v, faces_j, attrs, K, image_size, image_size,
                             background=1.0, chunk=chunk)
        frames.append(np.asarray(img[0]))
    frames = np.stack(frames)
    if out_path:
        from nerf3dtalker_tpu.utils.video import write_video

        write_video(frames, out_path, fps=fps)
    return frames
