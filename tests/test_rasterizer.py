"""Differentiable rasterizer tests: coverage, z-buffering, interpolation,
gradients; SH lighting; 3DMM fit smoke test on a toy mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf3dtalker_tpu.models.face3d.nl3dmm import (
    Linear3DMMTexture,
    NonLinear3DMM,
    sh_lighting,
)
from nerf3dtalker_tpu.models.face3d.rasterizer import (
    interpolate_attributes,
    project_perspective,
    rasterize_mesh,
    render_mesh,
    vertex_normals,
)


def _square_mesh(z=2.0, half=0.8):
    """Two triangles covering a square at depth z (camera space)."""
    verts = np.array(
        [[-half, -half, z], [half, -half, z], [half, half, z], [-half, half, z]],
        np.float32,
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    return jnp.asarray(verts[None]), jnp.asarray(faces)


def _inmat(H=16, f=8.0):
    K = np.array([[f, 0, H / 2], [0, f, H / 2], [0, 0, 1]], np.float32)
    return jnp.asarray(K[None])


def test_rasterize_covers_center():
    verts, faces = _square_mesh()
    screen = project_perspective(verts, _inmat())
    r = rasterize_mesh(screen, faces, 16, 16, chunk=2)
    m = np.asarray(r.mask[0])
    assert m[8, 8] == 1.0          # center covered
    assert m[0, 0] == 0.0          # corner outside
    # covered pixels have correct depth
    assert abs(float(r.zbuf[0, 8, 8]) - 2.0) < 1e-5
    # barycentrics sum to 1 on hits
    b = np.asarray(r.bary[0][m > 0])
    np.testing.assert_allclose(b.sum(-1), 1.0, atol=1e-5)


def test_zbuffer_prefers_near_face():
    near, faces_a = _square_mesh(z=1.5, half=0.3)
    far, _ = _square_mesh(z=3.0, half=0.3)
    verts = jnp.concatenate([far, near], axis=1)
    faces = jnp.concatenate([faces_a, faces_a + 4], axis=0)
    screen = project_perspective(verts, _inmat())
    r = rasterize_mesh(screen, faces, 16, 16, chunk=2)
    # center pixel must pick a near-square face (idx >= 2)
    assert int(r.face_idx[0, 8, 8]) >= 2
    assert abs(float(r.zbuf[0, 8, 8]) - 1.5) < 1e-5


def test_attribute_interpolation_and_background():
    verts, faces = _square_mesh()
    colors = jnp.asarray(
        np.array([[[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0]]], np.float32)
    )
    img, mask = render_mesh(verts, faces, colors, _inmat(), 16, 16,
                            background=0.25, chunk=2)
    img = np.asarray(img[0])
    m = np.asarray(mask[0])
    # background pixels = 0.25
    np.testing.assert_allclose(img[m == 0], 0.25, atol=1e-6)
    # interior colors within convex hull of vertex colors
    assert img[m > 0].min() >= -1e-5 and img[m > 0].max() <= 1.0 + 1e-5


def test_rasterizer_gradients_flow_to_vertices():
    verts, faces = _square_mesh()
    colors = jnp.ones((1, 4, 3)) * jnp.arange(4.0).reshape(1, 4, 1)

    def loss(v):
        img, _ = render_mesh(v, faces, colors, _inmat(), 16, 16, chunk=2)
        return jnp.mean(img ** 2)

    g = jax.grad(loss)(verts)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.linalg.norm(g)) > 0


def test_vertex_normals_flat_square():
    verts, faces = _square_mesh()
    n = vertex_normals(verts, faces)
    # flat square at constant z: normals along -z or +z
    nz = np.asarray(n[0, :, 2])
    np.testing.assert_allclose(np.abs(nz), 1.0, atol=1e-5)


def test_sh_lighting_ambient_band():
    """Gamma with only the DC band scales colors uniformly."""
    rng = np.random.default_rng(0)
    normals = rng.standard_normal((1, 10, 3)).astype(np.float32)
    normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
    vcolor = jnp.ones((1, 10, 3))
    gamma = jnp.zeros((1, 27)).at[:, :3].set(1.0)  # DC white light
    out = sh_lighting(vcolor, jnp.asarray(normals), gamma)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(out)[0, 0, 0], rtol=1e-5
    )


def test_nl3dmm_decoders():
    geo = NonLinear3DMM(point_num=50, code_dims=179)
    p = geo.init(jax.random.key(0), jnp.zeros((2, 100)), jnp.zeros((2, 79)))
    v = geo.apply(p, jnp.zeros((2, 100)), jnp.zeros((2, 79)))
    assert v.shape == (2, 50, 3)
    tex = Linear3DMMTexture(point_num=50)
    pt = tex.init(jax.random.key(0), jnp.zeros((2, 100)))
    t = tex.apply(pt, jnp.zeros((2, 100)))
    assert t.shape == (2, 50, 3)
    np.testing.assert_allclose(np.asarray(t), 0.5, atol=1e-6)  # mu init


def test_fit3dmm_smoke():
    """Toy fit: recover gamma/pose on a 50-point random blob."""
    from nerf3dtalker_tpu.train.fit3dmm import fit_3dmm

    G = 7
    PN = G * G
    geo = NonLinear3DMM(point_num=PN, code_dims=179)
    gp = geo.init(jax.random.key(0), jnp.zeros((1, 100)), jnp.zeros((1, 79)))
    # bias the zero-code mesh to a planar grid in front of the camera
    xs, ys = np.meshgrid(
        np.linspace(-0.5, 0.5, G), np.linspace(-0.5, 0.5, G)
    )
    grid = np.stack([xs, ys, np.zeros_like(xs)], -1).reshape(-1)
    gp["params"]["geo_fc3"]["bias"] = jnp.asarray(grid.astype(np.float32))
    tex = Linear3DMMTexture(point_num=PN)
    tp = tex.init(jax.random.key(1), jnp.zeros((1, 100)))

    tri = []
    for r in range(G - 1):
        for c in range(G - 1):
            i = r * G + c
            tri += [[i, i + 1, i + G], [i + 1, i + G + 1, i + G]]
    faces = jnp.asarray(np.array(tri, np.int32))
    lm_index = jnp.arange(68) % PN
    H = W = 16
    gt = jnp.ones((1, H, W, 3)) * 0.5
    mask = jnp.ones((1, H, W, 1))
    lm2d = jnp.ones((1, 68, 2)) * 8.0

    try:
        # patch module constant for the small mesh; render path reads
        # point_num from the module defaults so rebuild via functools
        import functools

        from nerf3dtalker_tpu.models.face3d import nl3dmm as mod

        orig_nl = mod.NonLinear3DMM
        orig_tex = mod.Linear3DMMTexture
        mod.NonLinear3DMM = functools.partial(orig_nl, point_num=PN)
        mod.Linear3DMMTexture = functools.partial(orig_tex, point_num=PN)
        res = fit_3dmm(
            gp, tp, gt, mask, lm2d, _inmat(H), faces, lm_index,
            skinmask=jnp.ones((PN,)),
            stage1_iters=3, stage2_iters=5, chunk=16,
        )
        assert np.isfinite(res.losses["total_loss"])
        assert res.code().shape == (1, 306)
    finally:
        mod.NonLinear3DMM = orig_nl
        mod.Linear3DMMTexture = orig_tex
