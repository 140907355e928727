"""Per-frame step time vs frame batch size B (Reso64, fused path, fwd+bwd).

The bg-image render pass is batch-invariant (the background featmap is a
parameter), so batching frames amortizes it; this sweep quantifies the
rays/s/chip gain of B>1 training.
"""
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

from nerf3dtalker_tpu.config import reso64
from nerf3dtalker_tpu.models import HeadNeRF
from nerf3dtalker_tpu.utils.camera import base_cam, ray_grid
from nerf3dtalker_tpu.utils.timing import chained_time

cfg = reso64()
model = HeadNeRF(cfg, compute_dtype=jnp.bfloat16, use_fused=True)
xy, _ = ray_grid(cfg.featmap_size)
cam = base_cam(cfg.featmap_size)
f32 = np.float32

for B in [int(a) for a in (sys.argv[1:] or ["2", "4", "8"])]:
    rng = np.random.default_rng(0)
    inp = dict(
        batch_xy=jnp.asarray(np.tile(xy, (B, 1, 1))),
        shape_code=jnp.asarray(rng.standard_normal((B, 179)).astype(f32) * 0.1),
        appea_code=jnp.asarray(rng.standard_normal((B, 127)).astype(f32) * 0.1),
        audio_style=jnp.asarray(rng.standard_normal((B, 64)).astype(f32) * 0.1),
        Rmat=jnp.asarray(np.tile(cam.Rmat, (B, 1, 1))),
        Tvec=jnp.asarray(np.tile(cam.Tvec, (B, 1))),
        inv_inmat=jnp.asarray(np.tile(cam.inv_inmat, (B, 1, 1))),
    )
    params = model.init(jax.random.key(0), **inp)
    target = jnp.full((B, cfg.pred_img_size, cfg.pred_img_size, 3), 0.5)

    def loss_fn(p, aud):
        out = model.apply(p, **{**inp, "audio_style": aud})
        img = jnp.nan_to_num(out["merge_img"])
        return jnp.mean((img - target) ** 2) + jnp.mean((out["bg_img"] - 1.0) ** 2)

    grad_fn = jax.grad(loss_fn)
    dt = chained_time(
        lambda p: grad_fn(p, inp["audio_style"]),
        lambda p, g: jax.tree.map(lambda a, b: a - 1e-9 * b, p, g),
        params, iters=8,
    )
    print(json.dumps({
        "B": B,
        "ms_per_step": round(dt * 1e3, 2),
        "rays_per_s": round(B * cfg.n_rays / dt, 1),
    }), flush=True)
