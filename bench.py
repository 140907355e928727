"""Benchmark: rays/s/chip at Reso64, fwd+bwd (the BASELINE.json metric).

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Timing methodology: `jax.block_until_ready` is unreliable on the axon
TPU backend, so the measurement runs a *chained* in-jit lax.scan — each
iteration's params are perturbed by its own gradients, forcing strict
sequential execution — with one scalar host transfer at the end
(see nerf3dtalker_tpu/utils/timing.py).

vs_baseline anchors on an estimated A100 PyTorch reference throughput for
the same workload (see _A100_RAYS_PER_S); the BASELINE target is >= 3.0x.
"""

from __future__ import annotations

import json

import numpy as np

# Estimated reference throughput: the PyTorch HeadNeRF trainer at Reso64
# processes one 4096-ray frame per optimizer step; published HeadNeRF-class
# training runs ~8-10 it/s on A100-80GB for this workload (unfused
# [B,306,4096,64] conv1x1 stack fwd+bwd) => ~35-40k rays/s. Until a torch
# run of the actual reference is possible in-image, this constant anchors
# vs_baseline; it errs high (favoring the baseline).
_A100_RAYS_PER_S = 40_000.0


def main():
    import jax
    import jax.numpy as jnp

    from nerf3dtalker_tpu.config import reso64
    from nerf3dtalker_tpu.models import HeadNeRF
    from nerf3dtalker_tpu.utils.camera import base_cam, ray_grid
    from nerf3dtalker_tpu.utils.timing import chained_time

    cfg = reso64()
    # fused Pallas render kernel (fwd + bwd) — the production TPU path
    # fused_input_grads=False: the parameter-only train step never uses
    # d_pe/d_zd/d_zv, and Pallas outputs can't be DCE'd by XLA
    model = HeadNeRF(
        cfg, compute_dtype=jnp.bfloat16, use_fused=True,
        fused_input_grads=False,
    )
    rng = np.random.default_rng(0)
    xy, _ = ray_grid(cfg.featmap_size)
    cam = base_cam(cfg.featmap_size)
    f32 = np.float32
    B = 1
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
    target = jnp.asarray(
        rng.uniform(0, 1, (B, cfg.pred_img_size, cfg.pred_img_size, 3))
        .astype(f32)
    )
    head_mask = jnp.asarray(
        (rng.uniform(0, 1, (B, cfg.pred_img_size, cfg.pred_img_size, 1))
         > 0.4).astype(f32)
    )
    # the FULL reference training objective (Utils/HeadNeRFLossUtils.py:
    # 125-156,196-236): bg + masked head/nonhead MSE + the VGG16
    # perceptual term — not a lighter MSE-only step
    from nerf3dtalker_tpu.models.perceptual import load_vgg16
    from nerf3dtalker_tpu.train.losses import headnerf_losses

    vgg_params = load_vgg16("")      # random features: full compute cost

    def loss_fn(p, aud):
        out = model.apply(p, **{**inp, "audio_style": aud})
        losses = headnerf_losses(
            out, target, head_mask, bg_value=1.0, vgg_params=vgg_params
        )
        return losses["total_loss"]

    grad_fn = jax.grad(loss_fn)

    def step(p):
        return grad_fn(p, inp["audio_style"])

    def perturb(p, grads):
        # SGD-like chaining: forces sequential dependence between iterations
        return jax.tree.map(lambda a, g: a - 1e-9 * g, p, grads)

    dt = chained_time(step, perturb, params, iters=10)

    n_rays = B * cfg.n_rays
    rays_per_s = n_rays / dt
    print(
        json.dumps(
            {
                "metric": "rays_per_s_per_chip_reso64_fwdbwd",
                "value": round(rays_per_s, 1),
                "unit": "rays/s",
                "vs_baseline": round(rays_per_s / _A100_RAYS_PER_S, 3),
                "loss": "bg+head+nonhead+vgg16 (full reference objective)",
            }
        )
    )


if __name__ == "__main__":
    main()
