"""Decompose the Reso64 train-step overhead: time fwd+bwd of (a) the
PE/sample-generation front-end, (b) the neural-renderer back-end (x2, as in
the step: merge + bg), in isolation. Compare with the fused kernel's
18.8 ms and the 25.8 ms full step."""
import json

import numpy as np
import jax
import jax.numpy as jnp

from nerf3dtalker_tpu.config import reso64
from nerf3dtalker_tpu.models.neural_renderer import NeuralRenderer
from nerf3dtalker_tpu.ops.embedding import positional_encoding
from nerf3dtalker_tpu.ops.rays import gen_rays, sample_points, stratified_zvals
from nerf3dtalker_tpu.utils.camera import base_cam, ray_grid
from nerf3dtalker_tpu.utils.timing import chained_time

cfg = reso64()
B = 1
rng = np.random.default_rng(0)
xy, _ = ray_grid(cfg.featmap_size)
cam = base_cam(cfg.featmap_size)
batch_xy = jnp.asarray(np.tile(xy, (B, 1, 1)))
Rmat = jnp.asarray(np.tile(cam.Rmat, (B, 1, 1)))
Tvec = jnp.asarray(np.tile(cam.Tvec, (B, 1)))
inv_inmat = jnp.asarray(np.tile(cam.inv_inmat, (B, 1, 1)))

# (a) front-end: rays -> samples -> PE -> pad; bwd to a camera param
def frontend(tvec):
    rays = gen_rays(batch_xy, Rmat, tvec, inv_inmat)
    zb = stratified_zvals(rays, cfg.num_sample_coarse, cfg.world_z1, cfg.world_z2, None)
    sp = sample_points(rays, zb)
    pe = positional_encoding(sp.pts, cfg.vp_n_freqs, cfg.vp_include_input)
    pe = jnp.pad(pe, ((0, 0), (0, 0), (0, 0), (0, 64 - pe.shape[-1])))
    return jnp.sum(pe.astype(jnp.float32) ** 2) + jnp.sum(sp.z_dists)

g_front = jax.grad(frontend)
dt = chained_time(lambda t: g_front(t), lambda t, g: t - 1e-12 * g, Tvec, iters=10)
print(json.dumps({"part": "frontend_pe", "ms": round(dt * 1e3, 2)}), flush=True)

# (b) renderer x2 fwd+bwd
model = NeuralRenderer(
    feat_nc=cfg.featmap_nc, out_dim=3, final_actvn=True, min_feat=32,
    featmap_size=cfg.featmap_size, img_size=cfg.pred_img_size,
    bg_type=cfg.bg_type, compute_dtype=jnp.bfloat16,
)
feat = jnp.asarray(
    rng.standard_normal((B, cfg.featmap_size, cfg.featmap_size, cfg.featmap_nc))
    .astype(np.float32)
)
params = model.init(jax.random.key(0), feat)

def rloss(p, f):
    img1 = model.apply(p, f)
    bg = model.apply(p, model.bind(p).bg_featmap())
    return jnp.mean((img1 - 0.5) ** 2) + jnp.mean((bg - 1.0) ** 2)

g_r = jax.grad(rloss)
dt = chained_time(
    lambda p: g_r(p, feat), lambda p, g: jax.tree.map(lambda a, b: a - 1e-9 * b, p, g),
    params, iters=10,
)
print(json.dumps({"part": "renderer_x2", "ms": round(dt * 1e3, 2)}), flush=True)
