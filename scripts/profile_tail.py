"""Decompose the trainer-step tail above bench.py's grad step
(VERDICT r4 #4: 66 ms trainer step vs 51.3 ms grad step at B=2).

Times, in isolation on the chip with the chained in-jit recipe:
  * Audio2Style fwd+bwd (B=2 mel chunks) — per-cell vs MXU-fused BiLSTM
  * the two-group Adam update over the full Reso64 param tree
  * the finite-step guard (guarded_update + opt-state select)

    python scripts/profile_tail.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from nerf3dtalker_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()

    import jax
    import jax.numpy as jnp

    from nerf3dtalker_tpu.config import TrainConfig, reso64
    from nerf3dtalker_tpu.models import HeadNeRF
    from nerf3dtalker_tpu.models.audio import Audio2Style
    from nerf3dtalker_tpu.train.step import make_optimizer
    from nerf3dtalker_tpu.utils.camera import base_cam, ray_grid
    from nerf3dtalker_tpu.utils.timing import chained_time

    B = 2
    rng = np.random.default_rng(0)
    mels = jnp.asarray(rng.standard_normal((B, 80, 16)).astype(np.float32))
    out = {"platform": jax.default_backend(), "B": B}

    # ---- Audio2Style fwd+bwd, per-cell vs fused --------------------------
    for name, fused in (("a2s_cell", False), ("a2s_fused", True)):
        a2s = Audio2Style(fused_rnn=fused)
        p = a2s.init(jax.random.key(0), mels)

        def loss(p):
            return jnp.sum(a2s.apply(p, mels) ** 2)

        g = jax.grad(loss)
        dt = chained_time(
            g, lambda p, gr: jax.tree.map(lambda a, b: a - 1e-9 * b, p, gr),
            p, iters=20,
        )
        out[name + "_ms"] = round(dt * 1e3, 3)
        print(name, out[name + "_ms"], "ms", flush=True)

    # ---- full-tree Adam update + guard -----------------------------------
    cfg = reso64()
    tc = TrainConfig()
    model = HeadNeRF(cfg, compute_dtype=jnp.bfloat16, use_fused=False)
    xy, _ = ray_grid(cfg.featmap_size)
    cam = base_cam(cfg.featmap_size)
    nerf_p = model.init(
        jax.random.key(0),
        batch_xy=jnp.asarray(np.tile(xy, (1, 1, 1))),
        shape_code=jnp.zeros((1, cfg.shape_code_dims)),
        appea_code=jnp.zeros((1, cfg.appea_code_dims)),
        audio_style=jnp.zeros((1, cfg.audio_style_dims)),
        Rmat=jnp.asarray(cam.Rmat), Tvec=jnp.asarray(cam.Tvec),
        inv_inmat=jnp.asarray(cam.inv_inmat),
    )
    a2s = Audio2Style()
    params = {"nerf": nerf_p, "audio": a2s.init(jax.random.key(1), mels)}
    optimizer = make_optimizer(tc, steps_per_epoch=16)
    opt_state = optimizer.init(params)
    import optax

    def adam_once(carry):
        p, st = carry
        grads = jax.tree.map(lambda x: x * 1e-6 + 1e-9, p)
        upd, st = optimizer.update(grads, st, p)
        return (optax.apply_updates(p, upd), st)

    dt = chained_time(
        adam_once, lambda c, o: o, (params, opt_state), iters=20,
    )
    out["adam_two_group_ms"] = round(dt * 1e3, 3)
    print("adam", out["adam_two_group_ms"], "ms", flush=True)

    from nerf3dtalker_tpu.utils.guards import guarded_update, tree_select

    def guard_once(p):
        grads = jax.tree.map(lambda x: x * 1e-6, p)
        newp = jax.tree.map(lambda a, b: a - 1e-9 * b, p, grads)
        newp, ok = guarded_update(p, newp, grads)
        return tree_select(ok, newp, p)

    dt = chained_time(guard_once, lambda p, o: o, params, iters=20)
    out["guard_ms"] = round(dt * 1e3, 3)
    print("guard", out["guard_ms"], "ms", flush=True)

    n_leaf = sum(x.size for x in jax.tree.leaves(params))
    out["param_count_m"] = round(n_leaf / 1e6, 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
