"""Probe: can Mosaic lower bf16 transposed contractions (x.T @ g) when the
operands are (a) computed values, (b) roundtripped through a VMEM scratch
ref, (c) loaded straight from input refs? Determines whether the fused
backward's dW products can run at bf16 MXU rate."""
import functools
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

N, K, H = 1024, 384, 384
bf16 = jnp.bfloat16
f32 = jnp.float32


def mmT(a, b):
    return jax.lax.dot_general(
        a, b, (((0,), (0,)), ((), ())), preferred_element_type=f32
    )


def mk_kernel(mode):
    def kernel(x_ref, g_ref, w_ref, out_ref, xs_ref, gs_ref):
        if mode == "loaded":
            # operands straight from input refs
            out_ref[...] = mmT(x_ref[...], g_ref[...])
            return
        x = jnp.maximum(
            jax.lax.dot_general(
                x_ref[...], w_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            ),
            0.0,
        ).astype(bf16)
        g = (g_ref[...] * 1.0).astype(bf16)
        if mode == "computed":
            out_ref[...] = mmT(x, g)
        elif mode == "scratch":
            xs_ref[...] = x
            gs_ref[...] = g
            out_ref[...] = mmT(xs_ref[...], gs_ref[...])
        elif mode == "f32":
            out_ref[...] = mmT(x.astype(f32), g.astype(f32))
    return kernel


rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((N, K)).astype(np.float32)).astype(bf16)
g = jnp.asarray(rng.standard_normal((N, H)).astype(np.float32)).astype(bf16)
w = jnp.asarray(rng.standard_normal((K, H)).astype(np.float32) * 0.05).astype(bf16)

for mode in ["loaded", "computed", "scratch", "f32"]:
    try:
        out = pl.pallas_call(
            mk_kernel(mode),
            out_shape=jax.ShapeDtypeStruct((K if mode == "loaded" else H, H), f32),
            scratch_shapes=[
                pltpu.VMEM((N, H), bf16),
                pltpu.VMEM((N, H), bf16),
            ],
        )(x, g, w)
        out.block_until_ready()
        print(f"{mode:9s} OK  sum={float(jnp.sum(out)):.3f}", flush=True)
    except Exception as e:
        msg = str(e).replace("\n", " ")[:160]
        print(f"{mode:9s} FAIL {msg}", flush=True)
