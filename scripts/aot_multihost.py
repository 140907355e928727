"""Two-host-topology AOT evidence for the sharded train step.

Only one real chip is reachable in this environment, so the >=85%
two-host scaling target (BASELINE.md) cannot be measured; what CAN be
proven without hardware is that the flagship Reso64 fused step compiles
for a 16-device (2 hosts x 8 chips) mesh with the right collective
structure — weight-gradient psums present, no all-gather materializing a
ray-sample-sized operand. Run under a 16-device virtual CPU topology:

    XLA_FLAGS=--xla_force_host_platform_device_count=16 \
    JAX_PLATFORMS=cpu python scripts/aot_multihost.py

Prints one JSON record (appended to SCALING artifacts by hand).
"""

from __future__ import annotations

import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    want = os.environ.get("JAX_PLATFORMS")
    if want:
        jax.config.update("jax_platforms", want)
    n = len(jax.devices())
    if n < 16:
        raise SystemExit(
            f"need 16 virtual devices (have {n}); set XLA_FLAGS="
            "--xla_force_host_platform_device_count=16 JAX_PLATFORMS=cpu"
        )

    import numpy as np

    from nerf3dtalker_tpu.config import TrainConfig, reso64
    from nerf3dtalker_tpu.parallel import make_mesh
    from nerf3dtalker_tpu.train.step import build_step_fns

    mesh = make_mesh(data=4, rays=4)
    cfg = reso64()
    tc = TrainConfig(bf16_compute=True, use_vgg_loss=False)
    fns = build_step_fns(cfg, tc, mesh=mesh, use_fused=True)

    B, R, S = 2 * 4, cfg.n_rays, cfg.pred_img_size
    f32 = np.float32
    abstract = {
        "mels": jax.ShapeDtypeStruct((B, 80, 16), f32),
        "gt_rgb": jax.ShapeDtypeStruct((B, S, S, 3), f32),
        "head_mask": jax.ShapeDtypeStruct((B, S, S, 1), f32),
        "iden": jax.ShapeDtypeStruct((B, 100), f32),
        "expr": jax.ShapeDtypeStruct((B, 79), f32),
        "text": jax.ShapeDtypeStruct((B, 100), f32),
        "illu": jax.ShapeDtypeStruct((B, 27), f32),
        "audio_exp": jax.ShapeDtypeStruct((B, 64), f32),
        "Rmat": jax.ShapeDtypeStruct((B, 3, 3), f32),
        "Tvec": jax.ShapeDtypeStruct((B, 3), f32),
        "inv_inmat": jax.ShapeDtypeStruct((B, 3, 3), f32),
        "xy": jax.ShapeDtypeStruct((B, R, 2), f32),
    }
    rng0 = jax.random.key(0)
    state_shape = jax.eval_shape(fns.init, rng0, abstract)
    hlo = (
        fns.train_step_aot.lower(state_shape, abstract, rng0)
        .compile()
        .as_text()
    )
    assert "all-reduce" in hlo, "weight-grad psum missing"
    n_ar = hlo.count(" all-reduce(")
    bad = []
    biggest_ag = 0
    for line in hlo.splitlines():
        if "all-gather" not in line or "=" not in line:
            continue
        region = line.split("=", 1)[1].split("all-gather", 1)[0]
        for m in re.finditer(r"([a-z]+\d*)\[([\d,]*)\]", region):
            n_el = 1
            for d in m.group(2).split(","):
                if d:
                    n_el *= int(d)
            biggest_ag = max(biggest_ag, n_el * 4)
            if n_el * 4 > 64 * 1024 * 1024:
                bad.append(line.strip()[:120])
    assert not bad, f"ray-sample-sized all-gather: {bad}"
    print(json.dumps({
        "metric": "two_host_topology_aot",
        "platform": "cpu_virtual",
        "devices": 16,
        "mesh": "data=4 x rays=4 (2 hosts x 8 chips topology)",
        "scale": "reso64",
        "fused": "on",
        "compiled": True,
        "weight_grad_allreduce_count": n_ar,
        "largest_allgather_bytes": biggest_ag,
        "ray_axis_allgather": False,
        "note": "compile-only structural evidence; no 16-device hardware "
                "in-image to execute on",
    }))


if __name__ == "__main__":
    main()
