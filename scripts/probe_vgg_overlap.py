"""Measure the ceiling of cross-step VGG pipelining (VERDICT r4 weak #3).

The round-3/4 README rejected one-step-stale VGG pipelining on semantic
grounds (stale perceptual gradients break SGD-equivalence) without a
measurement. This probe supplies the number: at the headline shape
(B=2, precomputed-GT), the ENTIRE serial cost of the pred-branch VGG
term is the delta between the full-objective step and the same step
with the VGG term removed. Even a perfect overlap scheme — stale
gradients, extra memory for the held graph, semantic drift — cannot
recover more than that delta.

    python scripts/probe_vgg_overlap.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench


def main():
    import jax  # noqa: F401  (device init before timing)

    # reuse bench.py's harness: same model cache, same chained timing
    ns = {}

    def cap(name, **kw):
        ns[name] = kw

    # replicate bench.main()'s run() closure minimally: call into the
    # module-level pieces it exposes
    import jax.numpy as jnp
    import numpy as np

    from nerf3dtalker_tpu.config import reso64
    from nerf3dtalker_tpu.models import HeadNeRF
    from nerf3dtalker_tpu.models.perceptual import load_vgg16, vgg_features
    from nerf3dtalker_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()
    cfg = reso64()
    vgg_params = load_vgg16("")
    rng = np.random.default_rng(0)
    model = HeadNeRF(cfg, compute_dtype=jnp.bfloat16, use_fused=True,
                     fused_input_grads=False)

    def measure(use_vgg):
        B = 2
        inp = bench._inputs(cfg, B, np.random.default_rng(0))
        params = model.init(jax.random.key(0), **inp)
        S = cfg.pred_img_size
        target = jnp.asarray(rng.uniform(0, 1, (B, S, S, 3)).astype(np.float32))
        head_mask = jnp.asarray(
            (rng.uniform(0, 1, (B, S, S, 1)) > 0.4).astype(np.float32)
        )
        vp = vgg_params if use_vgg else None
        gt_feats = None
        if use_vgg:
            masked = target * head_mask + 1.0 * (1.0 - head_mask)
            gt_feats = [jnp.asarray(f) for f in vgg_features(vp, masked)]
        dt = bench._measure(model, cfg, params, inp, target, head_mask, vp,
                            gt_feats, iters=10)
        return dt * 1e3

    full_ms = measure(use_vgg=True)
    mse_ms = measure(use_vgg=False)
    delta = full_ms - mse_ms
    out = {
        "metric": "vgg_overlap_ceiling_b2",
        "platform": "tpu",
        "b2_full_precomp_ms": round(full_ms, 2),
        "b2_mse_ms": round(mse_ms, 2),
        "vgg_serial_ms": round(delta, 2),
        "max_pipelining_gain_pct": round(delta / full_ms * 100.0, 2),
        "note": "upper bound on cross-step (one-step-stale) VGG "
                "pipelining at the headline shape: even perfect overlap "
                "recovers at most vgg_serial_ms per step, at the cost of "
                "stale perceptual gradients and a held backward graph",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
