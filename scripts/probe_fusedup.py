"""Bisect the fused-upsampler Mosaic failure: compile each block's fwd and
bwd kernel separately on the real chip."""
import sys, time
import numpy as np, jax, jax.numpy as jnp
from nerf3dtalker_tpu.config import reso64
from nerf3dtalker_tpu.models.neural_renderer import NeuralRenderer
from nerf3dtalker_tpu.models.phase_renderer import extract_phase_params
from nerf3dtalker_tpu.ops.pallas.fused_upsampler import (
    block_weight_list, _fwd_call, _bwd_call)

cfg = reso64()
nr = NeuralRenderer(feat_nc=cfg.featmap_nc, featmap_size=cfg.featmap_size,
                    img_size=cfg.pred_img_size)
x0 = jnp.zeros((1, cfg.featmap_size, cfg.featmap_size, cfg.featmap_nc), jnp.bfloat16)
p = nr.init(jax.random.key(0), x0)
n_blocks = cfg.n_upsample_blocks
pp = extract_phase_params(p, n_blocks)
strip = (16, 16, 8)
which = sys.argv[1] if len(sys.argv) > 1 else "fwd"
B, Hc = 1, cfg.featmap_size
net = x0[:, None]                      # [1,1,64,64,256]
rgb = jnp.zeros((1, 1, Hc, Hc, 3), jnp.bfloat16)
for i in range(n_blocks):
    wl = tuple(block_weight_list(pp, i))
    R = strip[i]
    t0 = time.time()
    try:
        out = _fwd_call(net, None if i == 0 else rgb, wl, i, R, "bfloat16", False)
        jax.block_until_ready(out)
        print(f"block {i} fwd OK {time.time()-t0:.1f}s out {out[0].shape}", flush=True)
    except Exception as e:
        print(f"block {i} fwd FAIL: {str(e)[:300]}", flush=True)
        break
    if which == "bwd":
        gnet = jnp.zeros(out[0].shape, jnp.bfloat16)
        grgb = jnp.zeros(out[1].shape, jnp.bfloat16)
        t0 = time.time()
        try:
            g = _bwd_call(net, None if i == 0 else rgb, gnet, grgb, wl, i, R,
                          "bfloat16", False)
            jax.block_until_ready(g)
            print(f"block {i} bwd OK {time.time()-t0:.1f}s", flush=True)
        except Exception as e:
            print(f"block {i} bwd FAIL: {str(e)[:300]}", flush=True)
            break
    net, rgb = out
