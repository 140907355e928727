"""CropAndExtract: image -> aligned crop -> BFM coefficients -> expression.

Equivalent of the reference's thrice-duplicated `CropAndExtract`
(talker_trainer.py:188-316, XGaze_utils/data_loader_xgaze_new.py:437-564,
s_utils/preprocess.py:46+): detect/align the face, run the Deep3DFaceRecon
ResNet50 `net_recon`, split the 257 coefficients, return the 64-d `exp`
slice that drives the NeRF expression code (split at
talker_trainer.py:164-185).

Composed from this package's parts — one implementation, injectable
detector/landmarker.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import numpy as np


def crop_and_extract(
    image: np.ndarray,               # [H, W, 3] float in [0,1]
    recon_apply: Callable,           # aligned [1,224,224,3] -> [1,257]
    landmarks: Optional[np.ndarray] = None,   # [68, 2]; else fan_apply used
    fan_apply: Optional[Callable] = None,
    crop_size: int = 224,
) -> Dict[str, np.ndarray]:
    """Returns the split coefficient dict (id/exp/tex/angle/gamma/trans)."""
    from nerf3dtalker_tpu.data.align import align_face
    from nerf3dtalker_tpu.models.face3d.bfm import split_coeff
    import jax.numpy as jnp

    if landmarks is None:
        if fan_apply is None:
            raise ValueError("need landmarks or a fan_apply")
        landmarks = np.asarray(fan_apply(image[None]))[0]

    aligned, _ = align_face(image, landmarks, out_size=crop_size)
    coeffs = np.asarray(recon_apply(aligned[None]))
    d = split_coeff(jnp.asarray(coeffs))
    return {k: np.asarray(v)[0] for k, v in d.items()}


def extract_exp_sequence(
    images: np.ndarray,              # [T, H, W, 3]
    recon_apply: Callable,
    landmarks: Optional[np.ndarray] = None,   # [T, 68, 2]
    fan_apply: Optional[Callable] = None,
) -> np.ndarray:
    """Per-frame `exp` extraction [T, 64] (the sad_exp/wav_gen targets the
    reference recomputes inside __getitem__)."""
    exps = []
    for t in range(len(images)):
        lm = landmarks[t] if landmarks is not None else None
        d = crop_and_extract(images[t], recon_apply, lm, fan_apply)
        exps.append(d["exp"])
    return np.stack(exps)
