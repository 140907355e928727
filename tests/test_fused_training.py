"""Training through the fused kernel's custom_vjp must match the standard
path's gradients (interpret mode on CPU, flagship dims, small ray count
via sliced xy grid)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf3dtalker_tpu.config import reso64
from nerf3dtalker_tpu.models import HeadNeRF
from nerf3dtalker_tpu.utils.camera import base_cam, ray_grid

CFG = reso64()


def _inputs():
    rng = np.random.default_rng(0)
    xy, _ = ray_grid(CFG.featmap_size)
    cam = base_cam(CFG.featmap_size)
    return dict(
        batch_xy=jnp.asarray(xy),
        shape_code=jnp.asarray(rng.standard_normal((1, 179)).astype(np.float32) * 0.1),
        appea_code=jnp.asarray(rng.standard_normal((1, 127)).astype(np.float32) * 0.1),
        audio_style=jnp.asarray(rng.standard_normal((1, 64)).astype(np.float32) * 0.1),
        Rmat=jnp.asarray(cam.Rmat),
        Tvec=jnp.asarray(cam.Tvec),
        inv_inmat=jnp.asarray(cam.inv_inmat),
    )


def test_fused_grads_match_standard():
    inp = _inputs()
    m_std = HeadNeRF(CFG)
    m_fused = HeadNeRF(CFG, use_fused=True, fused_interpret=True)
    params = m_std.init(jax.random.key(0), **inp)
    target = jnp.full((1, CFG.pred_img_size, CFG.pred_img_size, 3), 0.4)

    def loss(model, p):
        out = model.apply(p, **inp)
        return jnp.mean((out["merge_img"] - target) ** 2)

    l1, g1 = jax.value_and_grad(lambda p: loss(m_std, p))(params)
    l2, g2 = jax.value_and_grad(lambda p: loss(m_fused, p))(params)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-3)

    flat1 = jax.tree_util.tree_leaves_with_path(g1)
    flat2 = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_leaves_with_path(g2)[0:len(flat1)] if True}
    flat2 = {jax.tree_util.keystr(k): v for k, v in jax.tree_util.tree_flatten_with_path(g2)[0]}
    for k, v1 in jax.tree_util.tree_flatten_with_path(g1)[0]:
        key = jax.tree_util.keystr(k)
        v2 = flat2[key]
        n1 = float(jnp.linalg.norm(v1))
        n2 = float(jnp.linalg.norm(v2))
        # same gradient up to fp reassociation
        assert abs(n1 - n2) <= 2e-2 * max(n1, n2, 1e-6), (key, n1, n2)
