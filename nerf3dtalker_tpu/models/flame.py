"""FLAME head model with linear blend skinning (pure jnp).

Equivalents of reference `lipsrc/models/FLAME.py:37-272` and
`lipsrc/models/lbs.py:1-377` (SMPL-family LBS: shape/expression
blendshapes, pose-corrective blendshapes, kinematic-chain rigid transform,
skinning weights, static + pose-dependent dynamic landmark embeddings).
Model arrays load from the standard FLAME pickle via :func:`load_flame`.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def batch_rodrigues(rot_vecs: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """Axis-angle [N, 3] -> rotation matrices [N, 3, 3] (lbs.py:274-305)."""
    angle = jnp.linalg.norm(rot_vecs + eps, axis=1, keepdims=True)
    rot_dir = rot_vecs / angle
    cos = jnp.cos(angle)[:, None]
    sin = jnp.sin(angle)[:, None]
    rx, ry, rz = rot_dir[:, 0], rot_dir[:, 1], rot_dir[:, 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=1
    ).reshape(-1, 3, 3)
    ident = jnp.eye(3)[None]
    return ident * cos + (1 - cos) * jnp.einsum(
        "bi,bj->bij", rot_dir, rot_dir
    ) + sin * K


def blend_shapes(betas: jnp.ndarray, shape_disps: jnp.ndarray) -> jnp.ndarray:
    """[B, K] x [V, 3, K] -> [B, V, 3] (lbs.py:250-271)."""
    return jnp.einsum("bk,vck->bvc", betas, shape_disps)


def batch_rigid_transform(
    rot_mats: jnp.ndarray,   # [B, J, 3, 3]
    joints: jnp.ndarray,     # [B, J, 3]
    parents: np.ndarray,     # [J] (-1 root)
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Kinematic-chain forward transforms (lbs.py:321-377).

    Returns (posed_joints [B,J,3], rel_transforms [B,J,4,4]).
    """
    B, J = joints.shape[:2]
    rel_joints = joints.at[:, 1:].add(-joints[:, np.asarray(parents[1:])])

    def make_T(R, t):
        T = jnp.concatenate([R, t[..., None]], axis=-1)       # [B,3,4]
        bottom = jnp.tile(jnp.asarray([[0.0, 0, 0, 1]]), (B, 1, 1))
        return jnp.concatenate([T, bottom], axis=1)           # [B,4,4]

    transforms = [make_T(rot_mats[:, 0], rel_joints[:, 0])]
    for j in range(1, J):
        T = make_T(rot_mats[:, j], rel_joints[:, j])
        transforms.append(transforms[parents[j]] @ T)
    A = jnp.stack(transforms, axis=1)                          # [B,J,4,4]

    posed = A[:, :, :3, 3]
    # remove the rest-pose joint contribution (lbs.py:368-375)
    joints_h = jnp.concatenate([joints, jnp.zeros((B, J, 1))], axis=-1)
    correction = jnp.einsum("bjik,bjk->bji", A, joints_h)
    rel = A.at[:, :, :3, 3].add(-correction[:, :, :3])
    return posed, rel


def lbs(
    betas: jnp.ndarray,      # [B, n_shape + n_exp]
    pose: jnp.ndarray,       # [B, J*3] axis-angle full pose
    v_template: jnp.ndarray, # [V, 3]
    shapedirs: jnp.ndarray,  # [V, 3, K]
    posedirs: jnp.ndarray,   # [P, V*3]
    J_regressor: jnp.ndarray,  # [J, V]
    parents: np.ndarray,
    lbs_weights: jnp.ndarray,  # [V, J]
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Full LBS (lbs.py:140-227): returns (vertices [B,V,3], joints)."""
    B = betas.shape[0]
    v_shaped = v_template[None] + blend_shapes(betas, shapedirs)
    J = jnp.einsum("jv,bvc->bjc", J_regressor, v_shaped)

    rot_mats = batch_rodrigues(pose.reshape(-1, 3)).reshape(B, -1, 3, 3)
    ident = jnp.eye(3)
    pose_feature = (rot_mats[:, 1:] - ident).reshape(B, -1)
    pose_offsets = (pose_feature @ posedirs).reshape(B, -1, 3)
    v_posed = v_shaped + pose_offsets

    J_posed, A = batch_rigid_transform(rot_mats, J, parents)

    W = lbs_weights[None]                                      # [1, V, J]
    T = jnp.einsum("bvj,bjik->bvik", jnp.broadcast_to(W, (B,) + W.shape[1:]), A)
    v_h = jnp.concatenate([v_posed, jnp.ones((B, v_posed.shape[1], 1))], -1)
    verts = jnp.einsum("bvik,bvk->bvi", T, v_h)[..., :3]
    return verts, J_posed


def vertices2landmarks(
    vertices: jnp.ndarray,       # [B, V, 3]
    faces: jnp.ndarray,          # [F, 3]
    lmk_faces_idx: jnp.ndarray,  # [B, L] or [L]
    lmk_bary: jnp.ndarray,       # [B, L, 3] or [L, 3]
) -> jnp.ndarray:
    """Barycentric landmark extraction (lbs.py:101-137)."""
    if lmk_faces_idx.ndim == 1:
        lmk_faces_idx = jnp.broadcast_to(
            lmk_faces_idx[None], (vertices.shape[0],) + lmk_faces_idx.shape
        )
        lmk_bary = jnp.broadcast_to(
            lmk_bary[None], (vertices.shape[0],) + lmk_bary.shape
        )
    fv = jnp.take(faces, lmk_faces_idx, axis=0)               # [B, L, 3]
    lv = jax.vmap(lambda vb, ib: jnp.take(vb, ib.reshape(-1), axis=0))(
        vertices, fv
    ).reshape(vertices.shape[0], -1, 3, 3)
    return jnp.einsum("blk,blkc->blc", lmk_bary, lv)


class FlameModel(NamedTuple):
    v_template: jnp.ndarray
    shapedirs: jnp.ndarray
    posedirs: jnp.ndarray
    J_regressor: jnp.ndarray
    parents: np.ndarray
    lbs_weights: jnp.ndarray
    faces: jnp.ndarray
    lmk_faces_idx: jnp.ndarray
    lmk_bary_coords: jnp.ndarray


def flame_forward(
    model: FlameModel,
    shape_params: jnp.ndarray,   # [B, n_shape]
    exp_params: jnp.ndarray,     # [B, n_exp]
    pose_params: jnp.ndarray,    # [B, 6] global + jaw (FLAME.py forward)
    eye_pose: jnp.ndarray | None = None,
    neck_pose: jnp.ndarray | None = None,
):
    """FLAME forward (FLAME.py:220-272): returns (verts, 3D landmarks)."""
    B = shape_params.shape[0]
    betas = jnp.concatenate([shape_params, exp_params], axis=1)
    eye = eye_pose if eye_pose is not None else jnp.zeros((B, 6))
    neck = neck_pose if neck_pose is not None else jnp.zeros((B, 3))
    full_pose = jnp.concatenate(
        [pose_params[:, :3], neck, pose_params[:, 3:], eye], axis=1
    )
    verts, _ = lbs(
        betas, full_pose, model.v_template, model.shapedirs, model.posedirs,
        model.J_regressor, model.parents, model.lbs_weights,
    )
    lmk = vertices2landmarks(
        verts, model.faces, model.lmk_faces_idx, model.lmk_bary_coords
    )
    return verts, lmk


def load_flame(
    flame_pkl: str, lmk_embedding_npy: str, n_shape: int = 100, n_exp: int = 50
) -> FlameModel:
    """Load the standard FLAME pickle + landmark embedding
    (FLAME.py:44-86)."""
    import pickle

    with open(flame_pkl, "rb") as f:
        m = pickle.load(f, encoding="latin1")

    def arr(x):
        return jnp.asarray(np.asarray(x, dtype=np.float64), dtype=jnp.float32)

    shapedirs = np.asarray(m["shapedirs"], np.float32)
    shapedirs = np.concatenate(
        [shapedirs[:, :, :n_shape], shapedirs[:, :, 300 : 300 + n_exp]], 2
    )
    posedirs = np.asarray(m["posedirs"], np.float32)
    posedirs = posedirs.reshape(-1, posedirs.shape[-1]).T
    parents = np.asarray(m["kintree_table"])[0].astype(np.int64)
    parents[0] = -1
    lmk = np.load(lmk_embedding_npy, allow_pickle=True, encoding="latin1")[()]
    return FlameModel(
        v_template=arr(m["v_template"]),
        shapedirs=jnp.asarray(shapedirs),
        posedirs=jnp.asarray(posedirs),
        J_regressor=arr(
            m["J_regressor"].todense()
            if hasattr(m["J_regressor"], "todense")
            else m["J_regressor"]
        ),
        parents=parents,
        lbs_weights=arr(m["weights"]),
        faces=jnp.asarray(np.asarray(m["f"], np.int32)),
        lmk_faces_idx=jnp.asarray(lmk["static_lmk_faces_idx"].astype(np.int32)),
        lmk_bary_coords=jnp.asarray(lmk["static_lmk_bary_coords"].astype(np.float32)),
    )
