"""Offline dataset preprocessing orchestrator.

Equivalent of reference `DataProcess/Gen_mask_lm_3DMM.py:33-266` (mask +
landmarks + 3DMM per image) plus everything the reference's DataLoader did
per item at train time (Wav2Lip lip-frame synthesis, SadTalker exp
extraction, mel chunking — XGaze_utils/data_loader_xgaze_new.py:938-1066),
run ONCE ahead of training (SURVEY.md §7 'Precompute, don't inline').

Pipeline per subject:
  1. head/eye masks        — BiSeNet parsing (models/bisenet.py)
  2. 68 landmarks          — FAN (models/fan.py)
  3. 3DMM codes + camera   — two-stage fitting (train/fit3dmm.py)
  4. per-frame mel chunks  — data/mel.py (or the native C++ front-end)
  5. audio expressions     — SimpleWrapperV2 netG (models/audio.py)
  6. blink ratios          — mel.blink_ratio_sequence

Outputs a dict of arrays matching data.dataset.REQUIRED_KEYS, saved as one
.npz per subject. All model weights are caller-supplied (converted from
the reference checkpoints); stages degrade gracefully when weights are
absent (masks default to all-foreground, exps to zeros) so the pipeline is
runnable end-to-end in any environment.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np


def preprocess_subject(
    images: np.ndarray,            # [T, H, W, 3] float in [0,1]
    wav: np.ndarray,               # [n_samples] 16 kHz audio
    bisenet_apply: Optional[Callable] = None,   # images -> parsing argmax
    fan_apply: Optional[Callable] = None,       # images -> [T, 68, 2]
    netg_apply: Optional[Callable] = None,      # (mels, ref, ratio) -> [T, 64]
    fit3dmm_fn: Optional[Callable] = None,      # imgs, masks, lms -> codes/cams
    featmap_size: int = 32,
    seed: int = 0,
) -> Dict[str, np.ndarray]:
    from nerf3dtalker_tpu.data.mel import blink_ratio_sequence, per_frame_mel_chunks
    from nerf3dtalker_tpu.utils.camera import base_cam

    T, H, W, _ = images.shape
    rng = np.random.default_rng(seed)
    f32 = np.float32

    # 1. masks
    if bisenet_apply is not None:
        from nerf3dtalker_tpu.models.bisenet import (
            correct_head_mask,
            head_mask_from_parsing,
        )

        parsing = np.asarray(bisenet_apply(images))
        masks = np.asarray(head_mask_from_parsing(parsing))
        masks = np.stack([correct_head_mask(m) for m in masks])[..., None]
    else:
        masks = np.ones((T, H, W, 1), f32)

    # 2. landmarks
    lms = (
        np.asarray(fan_apply(images)) if fan_apply is not None
        else np.tile(np.array([[W / 2, H / 2]], f32), (T, 68, 1))
    )

    # 4. mels (before 3 so netG can run) + 6. blink ratios
    mels = per_frame_mel_chunks(wav)
    Tm = min(T, len(mels))
    mels = mels[:Tm]
    ratios = blink_ratio_sequence(Tm, rng)[:, 0]

    # 3. 3DMM fitting
    if fit3dmm_fn is not None:
        fit = fit3dmm_fn(images[:Tm], masks[:Tm], lms[:Tm])
        iden, expr = np.asarray(fit.iden), np.asarray(fit.expr)
        text, illu = np.asarray(fit.text), np.asarray(fit.gamma)
        from nerf3dtalker_tpu.utils.rotations import euler_to_rmat
        import jax.numpy as jnp

        Rm = np.asarray(euler_to_rmat(jnp.asarray(fit.euler)))
        Tv = np.asarray(fit.tvec)
    else:
        iden = np.zeros((Tm, 100), f32)
        expr = np.zeros((Tm, 79), f32)
        text = np.zeros((Tm, 100), f32)
        illu = np.zeros((Tm, 27), f32)
        cam = base_cam(featmap_size)
        Rm = np.tile(cam.Rmat, (Tm, 1, 1))
        Tv = np.tile(cam.Tvec.reshape(1, 3), (Tm, 1))

    # 5. audio expressions (SadTalker netG over frame-0 reference)
    if netg_apply is not None:
        from nerf3dtalker_tpu.train.audio2exp_trainer import select_expr64
        import jax.numpy as jnp

        ref64 = np.asarray(select_expr64(jnp.asarray(expr[:1])))[0]
        audio_exp = np.asarray(netg_apply(mels, ref64, ratios))
    else:
        audio_exp = np.zeros((Tm, 64), f32)

    cam = base_cam(featmap_size)
    return {
        "images": images[:Tm].astype(f32),
        "head_mask": masks[:Tm].astype(f32),
        "mels": mels.astype(f32),
        "audio_exp": audio_exp.astype(f32),
        "iden": iden.astype(f32),
        "expr": expr.astype(f32),
        "text": text.astype(f32),
        "illu": illu.astype(f32),
        "Rmat": Rm.astype(f32),
        "Tvec": Tv.astype(f32),
        "inv_inmat": np.tile(cam.inv_inmat, (Tm, 1, 1)).astype(f32),
        "lm2d": lms[:Tm].astype(f32),
        "ratios": ratios.astype(f32),
    }


def save_subject(path: str, arrays: Dict[str, np.ndarray]) -> None:
    np.savez_compressed(path, **arrays)


def load_subject(path: str, featmap_size: int = 32):
    """-> FrameDataset over a saved subject npz."""
    from nerf3dtalker_tpu.data.dataset import FrameDataset, REQUIRED_KEYS
    from nerf3dtalker_tpu.utils.camera import ray_grid

    z = dict(np.load(path))
    xy, _ = ray_grid(featmap_size)
    return FrameDataset({k: z[k] for k in REQUIRED_KEYS}, xy)
