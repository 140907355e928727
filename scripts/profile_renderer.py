"""Micro-profile of NeuralRenderer variants on TPU: which op dominates the
5.35 ms (x2 passes, fwd+bwd)? Variants knock out blur / bilinear / tile to
attribute cost."""
import json

import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn

from nerf3dtalker_tpu.config import reso64
from nerf3dtalker_tpu.models import neural_renderer as NR
from nerf3dtalker_tpu.utils.timing import chained_time

cfg = reso64()
B = 1
rng = np.random.default_rng(0)
feat = jnp.asarray(
    rng.standard_normal((B, cfg.featmap_size, cfg.featmap_size, cfg.featmap_nc))
    .astype(np.float32)
)

orig_blur = NR.blur3
orig_bilinear = NR.bilinear_2x


def nearest_2x(x):
    B_, H, W, C = x.shape
    x = jnp.repeat(x, 2, axis=1)
    return jnp.repeat(x, 2, axis=2)


def run(name):
    model = NR.NeuralRenderer(
        feat_nc=cfg.featmap_nc, out_dim=3, final_actvn=True, min_feat=32,
        featmap_size=cfg.featmap_size, img_size=cfg.pred_img_size,
        bg_type=cfg.bg_type, compute_dtype=jnp.bfloat16,
    )
    params = model.init(jax.random.key(0), feat)

    def rloss(p, f):
        img1 = model.apply(p, f)
        bg = model.apply(p, model.bind(p).bg_featmap())
        return jnp.mean((img1 - 0.5) ** 2) + jnp.mean((bg - 1.0) ** 2)

    g = jax.grad(rloss)
    dt = chained_time(
        lambda p: g(p, feat),
        lambda p, gr: jax.tree.map(lambda a, b: a - 1e-9 * b, p, gr),
        params, iters=10,
    )
    print(json.dumps({"variant": name, "ms": round(dt * 1e3, 2)}), flush=True)


run("baseline")

NR.blur3 = lambda x: x
run("no_blur")
NR.blur3 = orig_blur

NR.bilinear_2x = nearest_2x
run("nearest_resize")
NR.bilinear_2x = orig_bilinear

NR.blur3 = lambda x: x
NR.bilinear_2x = nearest_2x
run("no_blur_no_bilinear")
