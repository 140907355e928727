"""End-to-end audio-driven talking-head synthesis driver.

The reference's headline inference flow (FittingSingleImage_new.py:620-1041
re-render loop + talker_trainer.py audio conditioning): a fitted subject
(latent codes + camera) is re-rendered once per audio frame with the
per-frame 64-d audio style vector (and optionally a per-frame expression
coefficient from the SadTalker audio2exp path) driving the NeRF.

TPU-first design: instead of the reference's one-frame-at-a-time Python
loop, frames are rendered in fixed-size batches under a single jit — the
batch dimension rides the existing HeadNeRF [B, ...] path (the fused
Pallas ray kernel is batch-aware), so T frames cost T/chunk kernel
launches with one compilation. The last chunk is padded, never recompiled.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from nerf3dtalker_tpu.models.headnerf import HeadNeRF
from nerf3dtalker_tpu.utils.camera import ray_grid


def animate_sequence(
    model: HeadNeRF,
    params,
    shape_code: np.ndarray,       # [1, 179] fitted iden+expr
    appea_code: np.ndarray,       # [1, 127]
    audio_styles: np.ndarray,     # [T, 64] per-frame style vectors
    cam: Dict[str, np.ndarray],   # Rmat [1,3,3], Tvec [1,3], inv_inmat [1,3,3]
    expr_seq: Optional[np.ndarray] = None,   # [T, expr_dims] override of the
                                             # expr slice (audio2exp output)
    chunk: int = 4,
) -> np.ndarray:
    """Render T frames; returns [T, H, W, 3] float32 in [0, 1]."""
    cfg = model.cfg
    T = audio_styles.shape[0]
    xy, _ = ray_grid(cfg.featmap_size)
    xy_b = jnp.asarray(np.tile(xy, (chunk, 1, 1)))
    Rmat = jnp.asarray(np.tile(cam["Rmat"], (chunk, 1, 1)))
    Tvec = jnp.asarray(np.tile(cam["Tvec"], (chunk, 1)))
    inv_inmat = jnp.asarray(np.tile(cam["inv_inmat"], (chunk, 1, 1)))
    appea_b = jnp.asarray(np.tile(appea_code, (chunk, 1)))
    shape_b = np.tile(shape_code, (chunk, 1)).astype(np.float32)

    # params are a jit ARGUMENT (not a closure constant): constant-baked
    # weights bloat the serialized program past remote-compile transport
    # limits and block program reuse across checkpoints
    @jax.jit
    def render_chunk(params, aud, shape_codes):
        out = model.apply(
            params, batch_xy=xy_b, shape_code=shape_codes,
            appea_code=appea_b, audio_style=aud,
            Rmat=Rmat, Tvec=Tvec, inv_inmat=inv_inmat,
        )
        return jnp.clip(out["merge_img"], 0.0, 1.0)

    # pipelined dispatch: keep a bounded window of chunks in flight so
    # compute overlaps the (possibly remote) host transfer — a per-chunk
    # np.asarray would serialize compute behind link latency, while an
    # unbounded window would hold every rendered frame in HBM at once
    # (a multi-minute wav at 512^2 is GBs of frame buffers)
    window = 8
    pending = []
    frames = []
    for start in range(0, T, chunk):
        aud = np.zeros((chunk, audio_styles.shape[1]), np.float32)
        n = min(chunk, T - start)
        aud[:n] = audio_styles[start:start + n]
        sc = shape_b.copy()
        if expr_seq is not None:
            e = expr_seq[start:start + n]
            sc[:n, cfg.iden_code_dims:cfg.iden_code_dims + e.shape[1]] = e
        pending.append(
            (render_chunk(params, jnp.asarray(aud), jnp.asarray(sc)), n)
        )
        if len(pending) > window:
            img, m = pending.pop(0)
            frames.append(np.asarray(img[:m], np.float32))
    frames += [np.asarray(img[:n], np.float32) for img, n in pending]
    return np.concatenate(frames, axis=0)


def styles_from_mels(
    a2s_apply, a2s_params, mels: np.ndarray, chunk: int = 0
) -> np.ndarray:
    """Audio2Style over the whole frame sequence [T, 80, 16] -> [T, 64]
    (the reference feeds the full sequence through the biLSTM once,
    talker_trainer.py:1035-1040)."""
    styles = a2s_apply(a2s_params, jnp.asarray(mels, jnp.float32))
    return np.asarray(styles, np.float32)
