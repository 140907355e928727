"""Model export: serialized StableHLO artifacts via ``jax.export``.

TPU-native equivalent of the reference's deployment-export path
(`s_face3d/models/arcface_torch/torch2onnx.py:1-63`, `onnx_helper.py` —
backbone -> ONNX for serving). Instead of ONNX, a jitted forward is
lowered once and serialized as versioned StableHLO bytes; the artifact
is ahead-of-time compilable on any JAX runtime (TPU/CPU) independent of
the Python model code, which is the idiomatic XLA serving story.

The artifact format is a small self-describing header (JSON: metadata +
flattened-params treedef) followed by the StableHLO payload, so a
server can reload it with nothing but this module.

Note: an artifact is lowered for the exporting process's platform
(header["platforms"], e.g. ['tpu'] when exported on-chip, ['cpu'] on a
dev box) — export on the platform you serve on.
"""

from __future__ import annotations

import json
import struct
from typing import Any, Callable, Dict, Optional, Sequence

_MAGIC = b"N3DT"


def export_fn(
    fn: Callable,
    *example_args,
    meta: Optional[Dict[str, Any]] = None,
) -> bytes:
    """Lower ``jit(fn)(*example_args)`` and serialize to StableHLO bytes.

    ``example_args`` may be arrays or ``jax.ShapeDtypeStruct``s; only
    shapes/dtypes matter. Returns the framed artifact.
    """
    import jax
    from jax import export as jexport

    specs = jax.tree.map(
        lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), example_args
    )
    exp = jexport.export(jax.jit(fn))(*specs)
    payload = bytes(exp.serialize())
    head = json.dumps(
        {
            "meta": meta or {},
            "in_tree": str(exp.in_tree),
            "in_avals": [str(a) for a in exp.in_avals],
            "out_avals": [str(a) for a in exp.out_avals],
            "platforms": list(exp.platforms),
        }
    ).encode("utf-8")
    return _MAGIC + struct.pack("<I", len(head)) + head + payload


def load_exported(blob: bytes):
    """Deserialize an :func:`export_fn` artifact.

    Returns ``(call, header)`` where ``call(*args)`` runs the compiled
    computation with the same calling convention as the exported fn.
    """
    from jax import export as jexport

    if len(blob) < 8 or blob[:4] != _MAGIC:
        raise ValueError("not a nerf3dtalker export artifact")
    (hlen,) = struct.unpack("<I", blob[4:8])
    if len(blob) < 8 + hlen:
        raise ValueError(
            f"truncated artifact: header claims {hlen} bytes, "
            f"only {len(blob) - 8} present"
        )
    header = json.loads(blob[8 : 8 + hlen].decode("utf-8"))
    exp = jexport.deserialize(bytearray(blob[8 + hlen :]))
    return exp.call, header


def _flagship(cfg=None):
    """(model, example inputs) for the flagship HeadNeRF forward on the
    XLA (non-Pallas) path — shared by export and target construction."""
    import jax.numpy as jnp

    from nerf3dtalker_tpu.config import reso64
    from nerf3dtalker_tpu.models import HeadNeRF
    from nerf3dtalker_tpu.utils.camera import base_cam, ray_grid

    cfg = cfg or reso64()
    model = HeadNeRF(cfg, use_fused=False)
    xy, _ = ray_grid(cfg.featmap_size)
    cam = base_cam(cfg.featmap_size)
    # ray_grid/base_cam already carry a leading batch dim of 1
    inp = dict(
        batch_xy=jnp.asarray(xy),
        shape_code=jnp.zeros((1, cfg.shape_code_dims)),
        appea_code=jnp.zeros((1, cfg.appea_code_dims)),
        audio_style=jnp.zeros((1, cfg.audio_style_dims)),
        Rmat=jnp.asarray(cam.Rmat),
        Tvec=jnp.asarray(cam.Tvec),
        inv_inmat=jnp.asarray(cam.inv_inmat),
    )
    return cfg, model, inp


def flagship_init(cfg=None, seed: int = 0):
    """Randomly initialized flagship params (the soft-load target)."""
    import jax

    _, model, inp = _flagship(cfg)
    return model.init(jax.random.key(seed), **inp)


def export_headnerf(cfg=None, params=None, path: Optional[str] = None) -> bytes:
    """Export the flagship HeadNeRF forward (params baked in as constants).

    Mirrors what `torch2onnx.py:24-39` does for the arcface backbone:
    weights are embedded so the artifact is fully standalone. Uses the
    XLA (non-Pallas) path so the artifact is portable across platforms.
    """
    cfg, model, inp = _flagship(cfg)
    if params is None:
        import jax

        params = model.init(jax.random.key(0), **inp)

    order = (
        "batch_xy shape_code appea_code audio_style Rmat Tvec inv_inmat"
    ).split()

    def fwd(*args):
        kw = dict(zip(order, args))
        return model.apply(params, **kw)["merge_img"]

    blob = export_fn(
        fwd,
        *(inp[k] for k in order),
        meta={
            "model": "headnerf",
            "featmap_size": cfg.featmap_size,
            "pred_img_size": cfg.pred_img_size,
            "arg_order": order,
        },
    )
    if path is not None:
        with open(path, "wb") as f:
            f.write(blob)
    return blob
