"""Device-mesh construction and sharding helpers.

Replaces the reference's NCCL/DDP scaffolding (`mp.spawn` +
`dist.init_process_group` + `DistributedDataParallel`,
StandardizedSpace/main/train_vq.py:41-122; `torch.distributed.launch`,
arcface_torch/train.py:20-58) with declarative JAX meshes:

  * axis "data"  — batch / frames (the DDP axis, P2 in SURVEY.md §2.9);
  * axis "rays"  — the NeRF ray dimension (P6, the embarrassingly-parallel
    axis unique to this workload);
  * axis "model" — optional tensor-parallel axis for the PartialFC-style
    sharded classifier (P4).

Multi-host initialization is `jax.distributed.initialize()` by the caller
(once per process) — no rendezvous URLs; collectives ride ICI within a
slice and DCN across slices.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = 1,
    rays: int = 1,
    model: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = data * rays * model
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    arr = np.array(devices[:n]).reshape(data, rays, model)
    return Mesh(arr, ("data", "rays", "model"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading-axis (batch) sharding over "data"."""
    return NamedSharding(mesh, P("data"))


def batch_ray_sharding(mesh: Mesh) -> NamedSharding:
    """[B, N_r, ...] arrays: batch over "data", rays over "rays"."""
    return NamedSharding(mesh, P("data", "rays"))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch dict on the mesh: leading dim over "data"; the
    per-ray arrays additionally over "rays"."""
    out = {}
    for k, v in batch.items():
        if k == "xy":
            out[k] = jax.device_put(v, batch_ray_sharding(mesh))
        else:
            out[k] = jax.device_put(v, batch_sharding(mesh))
    return out
