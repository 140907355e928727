"""FLAME/LBS math tests with a synthetic two-joint model."""

import jax.numpy as jnp
import numpy as np

from nerf3dtalker_tpu.models.flame import (
    FlameModel,
    batch_rigid_transform,
    batch_rodrigues,
    blend_shapes,
    flame_forward,
    lbs,
    vertices2landmarks,
)


def test_rodrigues_identity_and_quarter_turn():
    R = batch_rodrigues(jnp.zeros((1, 3)))
    np.testing.assert_allclose(np.asarray(R[0]), np.eye(3), atol=1e-6)
    # pi/2 around z rotates x->y
    R = batch_rodrigues(jnp.asarray([[0.0, 0.0, np.pi / 2]]))
    v = np.asarray(R[0]) @ np.array([1.0, 0, 0])
    np.testing.assert_allclose(v, [0, 1, 0], atol=1e-6)


def test_blend_shapes():
    disps = jnp.ones((5, 3, 2))
    out = blend_shapes(jnp.asarray([[2.0, -1.0]]), disps)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-6)


def _toy_model(n_joints=2, V=6):
    rng = np.random.default_rng(0)
    parents = np.array([-1] + list(range(n_joints - 1)), np.int64)
    # joints along the x axis
    Jreg = np.zeros((n_joints, V), np.float32)
    Jreg[0, 0] = 1.0
    Jreg[1, 1] = 1.0
    v_template = rng.standard_normal((V, 3)).astype(np.float32) * 0.1
    v_template[0] = [0, 0, 0]
    v_template[1] = [1, 0, 0]
    weights = np.zeros((V, n_joints), np.float32)
    weights[:, 1] = 1.0  # all verts follow joint 1
    return FlameModel(
        v_template=jnp.asarray(v_template),
        shapedirs=jnp.asarray(rng.standard_normal((V, 3, 4)).astype(np.float32) * 0.01),
        posedirs=jnp.asarray(np.zeros(((n_joints - 1) * 9, V * 3), np.float32)),
        J_regressor=jnp.asarray(Jreg),
        parents=parents,
        lbs_weights=jnp.asarray(weights),
        faces=jnp.asarray(np.array([[0, 1, 2], [1, 2, 3]], np.int32)),
        lmk_faces_idx=jnp.asarray(np.array([0, 1], np.int32)),
        lmk_bary_coords=jnp.asarray(
            np.array([[1.0, 0, 0], [0, 0.5, 0.5]], np.float32)
        ),
    )


def test_lbs_rest_pose_is_identity():
    m = _toy_model()
    betas = jnp.zeros((1, 4))
    pose = jnp.zeros((1, 2 * 3))
    verts, joints = lbs(
        betas, pose, m.v_template, m.shapedirs, m.posedirs, m.J_regressor,
        m.parents, m.lbs_weights,
    )
    np.testing.assert_allclose(
        np.asarray(verts[0]), np.asarray(m.v_template), atol=1e-5
    )


def test_lbs_joint_rotation_moves_children():
    m = _toy_model()
    betas = jnp.zeros((1, 4))
    # rotate joint 1 by pi/2 about z: vertices rotate about joint-1 origin
    pose = jnp.zeros((1, 6)).at[0, 5].set(np.pi / 2)
    verts, _ = lbs(
        betas, pose, m.v_template, m.shapedirs, m.posedirs, m.J_regressor,
        m.parents, m.lbs_weights,
    )
    # vertex 0 at origin relative to joint [1,0,0]: rotated to (1,-1,0)
    v0 = np.asarray(verts[0, 0])
    np.testing.assert_allclose(v0, [1.0, -1.0, 0.0], atol=1e-5)


def test_landmarks_barycentric():
    m = _toy_model()
    verts = m.v_template[None]
    lm = vertices2landmarks(verts, m.faces, m.lmk_faces_idx, m.lmk_bary_coords)
    np.testing.assert_allclose(np.asarray(lm[0, 0]), np.asarray(verts[0, 0]), atol=1e-6)
    want = 0.5 * (np.asarray(verts[0, 2]) + np.asarray(verts[0, 3]))
    np.testing.assert_allclose(np.asarray(lm[0, 1]), want, atol=1e-6)


def test_flame_forward_shapes():
    m = _toy_model()
    # flame_forward builds a 15-dof pose (global+neck+jaw+eyes) -> pad toy
    # model to 5 joints
    import dataclasses

    V = 6
    parents = np.array([-1, 0, 1, 2, 3], np.int64)
    m5 = m._replace(
        parents=parents,
        J_regressor=jnp.asarray(np.eye(5, V, dtype=np.float32)),
        lbs_weights=jnp.asarray(np.ones((V, 5), np.float32) / 5),
        posedirs=jnp.asarray(np.zeros((4 * 9, V * 3), np.float32)),
    )
    verts, lmk = flame_forward(
        m5, jnp.zeros((2, 2)), jnp.zeros((2, 2)), jnp.zeros((2, 6))
    )
    assert verts.shape == (2, V, 3)
    assert lmk.shape == (2, 2, 3)
    assert np.isfinite(np.asarray(verts)).all()
