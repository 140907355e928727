"""Measured same-hardware comparison vs the ACTUAL reference implementation.

The headline bench (bench.py) compares TPU rays/s against an *estimated*
A100 PyTorch throughput. This script removes the estimate from the
architecture question: it runs the reference's own HeadNeRFNet
(imported from /root/reference, pure torch) and this framework's XLA
path on the SAME host CPU, same workload (Reso64 fwd+bwd, MSE loss),
and reports the measured ratio. CPU numbers say nothing about absolute
TPU speed, but the ratio isolates what the layout redesign (channels-
last points MLP + code-fold biases vs [B,C,N_r,N_s] conv1x1 broadcast)
buys independent of hardware.

Usage: python scripts/bench_vs_reference_cpu.py [--featmap 64] [--iters 2]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--featmap", type=int, default=64)
    ap.add_argument("--img", type=int, default=0, help="0 = 8x featmap")
    ap.add_argument("--iters", type=int, default=2)
    ap.add_argument("--save", default="",
                    help="also write the record to this JSON path "
                         "(MEASURED_RATIO.json for bench.py to embed)")
    args = ap.parse_args()
    img = args.img or args.featmap * 8

    import torch

    import os

    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tests.test_reference_parity import _load_reference

    BaseOptions, HeadNeRFNet = _load_reference()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nerf3dtalker_tpu.config import NeRFConfig
    from nerf3dtalker_tpu.models import HeadNeRF
    from nerf3dtalker_tpu.utils.camera import base_cam, ray_grid

    opt = BaseOptions({"featmap_size": args.featmap, "featmap_nc": 256,
                       "pred_img_size": img})
    torch.manual_seed(0)
    ref_net = HeadNeRFNet(opt, include_vd=False, hier_sampling=False).train()

    rng = np.random.default_rng(0)
    f32 = np.float32
    xy, _ = ray_grid(args.featmap)
    cam = base_cam(args.featmap)
    shape = (rng.standard_normal((1, 179)) * 0.1).astype(f32)
    appea = (rng.standard_normal((1, 127)) * 0.1).astype(f32)
    aud = (rng.standard_normal((1, 64)) * 0.1).astype(f32)
    target = rng.uniform(0, 1, (1, img, img, 3)).astype(f32)

    # ---- reference torch step (fwd + bwd over params), CPU ----
    t_xy = torch.from_numpy(xy.astype(f32)).permute(0, 2, 1)
    t_codes = dict(
        audio_style=torch.from_numpy(aud),
        shape_code=torch.from_numpy(shape),
        appea_code=torch.from_numpy(appea),
    )
    t_cam = dict(
        batch_Rmats=torch.from_numpy(cam.Rmat.astype(f32)),
        batch_Tvecs=torch.from_numpy(cam.Tvec.astype(f32)[..., None]),
        bg_info=None,
        batch_inv_inmats=torch.from_numpy(cam.inv_inmat.astype(f32)),
    )
    t_target = torch.from_numpy(target).permute(0, 3, 1, 2)

    def torch_step():
        ref_net.zero_grad()
        res = ref_net(
            "train", t_xy, None, t_codes["audio_style"], None,
            t_codes["shape_code"], t_codes["appea_code"],
            t_cam["batch_Rmats"], t_cam["batch_Tvecs"],
            t_cam["batch_inv_inmats"],
        )
        loss = torch.mean(
            (res["coarse_dict"]["merge_img"] - t_target) ** 2
        )
        loss.backward()
        return float(loss)

    torch_step()  # warmup (allocator, thread pools)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        torch_step()
    torch_dt = (time.perf_counter() - t0) / args.iters

    # ---- this framework's XLA path, same CPU, same workload ----
    cfg = NeRFConfig(featmap_size=args.featmap, pred_img_size=img)
    model = HeadNeRF(cfg, use_fused=False)
    inp = dict(
        batch_xy=jnp.asarray(xy.astype(f32)),
        shape_code=jnp.asarray(shape),
        appea_code=jnp.asarray(appea),
        audio_style=jnp.asarray(aud),
        Rmat=jnp.asarray(cam.Rmat.astype(f32)),
        Tvec=jnp.asarray(cam.Tvec.astype(f32)),
        inv_inmat=jnp.asarray(cam.inv_inmat.astype(f32)),
    )
    params = model.init(jax.random.key(0), **inp)
    tgt = jnp.asarray(target)

    @jax.jit
    def jax_step(p):
        def loss_fn(p):
            out = model.apply(p, **inp)["merge_img"]
            return jnp.mean((out - tgt) ** 2)

        return jax.grad(loss_fn)(p)

    jax.block_until_ready(jax_step(params))  # compile
    t0 = time.perf_counter()
    for _ in range(args.iters):
        jax.block_until_ready(jax_step(params))
    jax_dt = (time.perf_counter() - t0) / args.iters

    n_rays = args.featmap * args.featmap
    rec = {
        "metric": f"cpu_same_host_fwdbwd_reso{args.featmap}",
        "torch_reference_s_per_step": round(torch_dt, 3),
        "jax_xla_s_per_step": round(jax_dt, 3),
        "torch_rays_per_s": round(n_rays / torch_dt, 1),
        "jax_rays_per_s": round(n_rays / jax_dt, 1),
        "speedup_same_hardware": round(torch_dt / jax_dt, 2),
    }
    print(json.dumps(rec))
    if args.save:
        # bench.py embeds this next to the estimate-derived vs_baseline
        with open(args.save, "w") as f:
            json.dump(rec, f, indent=1)


if __name__ == "__main__":
    main()
