"""On-TPU tuning + parity harness for the fused render kernel.

Sweeps fwd/bwd tile sizes at Reso64 and checks fused-vs-oracle gradient
agreement on the real chip. Not part of the test suite (needs TPU).
"""
import json
import sys

import numpy as np
import jax
import jax.numpy as jnp

from nerf3dtalker_tpu.ops.pallas import fused_render as fr
from nerf3dtalker_tpu.utils.timing import chained_time

B, R = 1, 4096
rng = np.random.default_rng(0)
f32 = np.float32

pe = jnp.asarray(rng.standard_normal((B, R, fr.NS, fr.PE_PAD)).astype(f32) * 0.3)
zd = jnp.asarray(rng.uniform(0.05, 0.12, (B, R, fr.NS)).astype(f32))
zv = jnp.asarray(np.cumsum(np.asarray(zd), axis=-1).astype(f32))

params = {}
mlp_rng = np.random.default_rng(1)


def glorot(shape):
    fan = shape[0] + shape[-1]
    return jnp.asarray(mlp_rng.standard_normal(shape).astype(f32) * np.sqrt(2.0 / fan))


H, H2, PE_LIVE, SC = fr.H, fr.H2, 63, 179
params = {
    "fea_0_kernel": glorot((PE_LIVE + SC + 64, H)), "fea_0_bias": jnp.zeros(H),
    "fea_5_kernel": glorot((PE_LIVE + SC + H, H)), "fea_5_bias": jnp.zeros(H),
    "rgb_1_kernel": glorot((H + 127, H2)), "rgb_1_bias": jnp.zeros(H2),
    "density_kernel": glorot((H, 1)), "density_bias": jnp.zeros(()),
    "rgb_0_kernel": glorot((H, H)), "rgb_0_bias": jnp.zeros(H),
    "rgb_2_kernel": glorot((H2, fr.FEAT)), "rgb_2_bias": jnp.zeros(fr.FEAT),
}
for i in (1, 2, 3, 4, 6, 7):
    params[f"fea_{i}_kernel"] = glorot((H, H))
    params[f"fea_{i}_bias"] = jnp.zeros(H)

shape_code = jnp.asarray(rng.standard_normal((B, SC)).astype(f32) * 0.1)
appea_code = jnp.asarray(rng.standard_normal((B, 127)).astype(f32) * 0.1)
audio = jnp.asarray(rng.standard_normal((B, 64)).astype(f32) * 0.1)
w = fr.pack_weights(params, shape_code, appea_code, audio)


def loss_with(tile_fwd, tile_bwd):
    import functools

    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def f(weights):
        return fr.fused_render_fwd(pe, zd, zv, weights, tile_rays=tile_fwd)

    def f_fwd(weights):
        return f(weights), weights

    def f_bwd(weights, g):
        gf, gb, gd = g
        # input_grads=False == the train-step configuration being tuned
        _, _, _, dw = fr.fused_render_bwd(
            pe, zd, zv, weights, gf, gb, gd, tile_rays=tile_bwd,
            input_grads=False,
        )
        return (dw,)

    f.defvjp(f_fwd, f_bwd)

    def loss(weights):
        feat, bg, depth = f(weights)
        return jnp.mean(feat**2) + jnp.mean(bg**2) + 0.01 * jnp.mean(depth**2)

    return jax.grad(loss)


if "--parity" in sys.argv:
    # oracle grads (f32 jnp)
    def oloss(weights):
        feat, bg, depth = fr.reference_render(pe, zd, zv, weights)
        return jnp.mean(feat**2) + jnp.mean(bg**2) + 0.01 * jnp.mean(depth**2)

    go = jax.grad(oloss)(w)
    gk = loss_with(64, 16)(w)
    for k in sorted(go):
        a, b = np.asarray(go[k], f32), np.asarray(gk[k], f32)
        denom = np.abs(a).max() + 1e-8
        rel = np.abs(a - b).max() / denom
        print(f"{k:5s} max_rel_err={rel:.3e}")
    sys.exit(0)

results = []
import ast

configs = (
    ast.literal_eval(sys.argv[1]) if len(sys.argv) > 1
    else [(64, 16), (64, 32), (128, 32)]
)
for tf, tb in configs:
    try:
        gfn = loss_with(tf, tb)

        def step(weights):
            return gfn(weights)

        def perturb(weights, g):
            return jax.tree.map(lambda a, b: a - 1e-9 * b, weights, g)

        dt = chained_time(step, perturb, w, iters=8)
        results.append({"tile_fwd": tf, "tile_bwd": tb, "ms": round(dt * 1e3, 2),
                        "rays_per_s": round(B * R / dt)})
        print(json.dumps(results[-1]), flush=True)
    except Exception as e:  # noqa
        print(json.dumps({"tile_fwd": tf, "tile_bwd": tb,
                          "error": str(e)[:200]}), flush=True)
