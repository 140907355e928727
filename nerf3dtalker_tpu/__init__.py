"""nerf3dtalker_tpu — a TPU-native talking-head NeRF framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
NeRF-3DTalker (reference: NeRF-3DTalker/NeRF-3DTalker-code): an
audio-conditioned HeadNeRF renderer, audio encoders, a VQ-VAE
"Standardized Space" refinement stage, 3DMM fitting, and the
preprocessing/metric stack around them.

Design principles (vs. the PyTorch reference):
  * channels-last `[B, N_rays, N_samples, C]` layouts so the point MLP is a
    plain matmul on the MXU (the reference disguises it as Conv2d 1x1 over
    `[B, C, N_r, N_s]`, NetWorks/models.py:29-59);
  * a pure functional core `render(params, rays, codes) -> images` that jits
    and shards with `jax.sharding` / `shard_map`;
  * Pallas fused ray-march kernels for the hot path;
  * one config system, one checkpoint format (orbax).
"""

__version__ = "0.1.0"

from nerf3dtalker_tpu.config import NeRFConfig, TrainConfig  # noqa: F401
