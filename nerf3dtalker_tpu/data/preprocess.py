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
the reference checkpoints); by default stages degrade gracefully when
weights are absent (masks default to all-foreground, exps to zeros), and
``strict=True`` raises instead — use :func:`build_appliers` to run the
full network path (BiSeNet -> FAN -> fit3dmm -> netG) with random or
converted weights.
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
    strict: bool = False,
) -> Dict[str, np.ndarray]:
    if strict:
        # no silent placeholder arrays: every model stage must be supplied
        # (build_appliers() wires the in-repo networks; convert reference
        # checkpoints via utils/convert.py for value parity)
        missing = [
            n for n, fn in [
                ("bisenet_apply", bisenet_apply), ("fan_apply", fan_apply),
                ("netg_apply", netg_apply), ("fit3dmm_fn", fit3dmm_fn),
            ] if fn is None
        ]
        if missing:
            raise ValueError(
                f"strict preprocessing: missing model stages {missing}"
            )
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


def build_appliers(
    image_size: int,
    seed: int = 0,
    weights: Optional[Dict] = None,
    mesh_grid: int = 7,
    fit_iters: tuple = (50, 200),
) -> Dict[str, Callable]:
    """Construct the four preprocessing model appliers with REAL networks.

    `weights` may supply converted reference checkpoints per stage
    ({"bisenet": ..., "fan": ..., "netg": ..., "nl3dmm": (geo, tex)});
    absent entries are randomly initialized — the full network path still
    runs end-to-end (BiSeNet parse -> FAN landmarks -> two-stage 3DMM fit
    -> netG audio-exp), only the VALUES need converted weights for parity.
    The 3DMM fit uses a `mesh_grid`^2-point mesh by default; pass the
    reference basis (models/face3d/nl3dmm.load_nl3dmm_basis) for the full
    34650-point model.
    """
    import jax
    import jax.numpy as jnp

    from nerf3dtalker_tpu.models.audio import (
        SimpleWrapperV2,
        audio2exp_sequence,
    )
    from nerf3dtalker_tpu.models.bisenet import BiSeNet
    from nerf3dtalker_tpu.models.fan import FAN, decode_heatmaps
    from nerf3dtalker_tpu.models.face3d.nl3dmm import (
        Linear3DMMTexture,
        NonLinear3DMM,
    )
    from nerf3dtalker_tpu.train.fit3dmm import fit_3dmm

    weights = weights or {}
    k = jax.random.split(jax.random.key(seed), 8)
    S = image_size

    bise = BiSeNet()
    bise_p = weights.get("bisenet") or bise.init(
        k[0], jnp.zeros((1, max(S, 64), max(S, 64), 3))
    )

    def bisenet_apply(images):
        x = jnp.asarray(images)
        if S < 64:   # trunk downsamples 32x; keep the parse grid sane
            x = jax.image.resize(x, (x.shape[0], 64, 64, 3), "linear")
        out = bise.apply(bise_p, x)
        parsing = jnp.argmax(out[0], axis=-1)
        if parsing.shape[1] != S:
            parsing = jax.image.resize(
                parsing.astype(jnp.float32), (x.shape[0], S, S), "nearest"
            ).astype(jnp.int32)
        return parsing

    fan = FAN(n_stacks=1)
    fan_p = weights.get("fan") or fan.init(k[1], jnp.zeros((1, 256, 256, 3)))

    def fan_apply(images):
        x = jnp.asarray(images)
        x = jax.image.resize(x, (x.shape[0], 256, 256, 3), "linear")
        hm = fan.apply(fan_p, x)
        hm = hm[-1] if isinstance(hm, (list, tuple)) else hm
        lm = decode_heatmaps(hm, crop_size=256)
        return lm * (S / 256.0)

    netg = SimpleWrapperV2()
    netg_p = weights.get("netg") or netg.init(
        k[2], jnp.zeros((1, 80, 16, 1)), jnp.zeros((1, 64)),
        jnp.zeros((1, 1)),
    )

    def netg_apply(mels, ref64, ratios):
        return audio2exp_sequence(
            netg.apply, netg_p, jnp.asarray(mels)[..., None],
            jnp.asarray(ref64), jnp.asarray(ratios),
        )

    G = mesh_grid
    PN = G * G
    geo = NonLinear3DMM(point_num=PN, code_dims=179)
    tex = Linear3DMMTexture(point_num=PN)
    if "nl3dmm" in weights:
        geo_p, tex_p = weights["nl3dmm"]
    else:
        geo_p = geo.init(k[3], jnp.zeros((1, 100)), jnp.zeros((1, 79)))
        # bias the zero-code mesh to a frontal planar grid so the fit has
        # plausible geometry to start from
        xs, ys = np.meshgrid(
            np.linspace(-0.5, 0.5, G), np.linspace(-0.5, 0.5, G)
        )
        grid = np.stack([xs, ys, np.zeros_like(xs)], -1).reshape(-1)
        geo_p["params"]["geo_fc3"]["bias"] = jnp.asarray(
            grid.astype(np.float32)
        )
        tex_p = tex.init(k[4], jnp.zeros((1, 100)))
    tri = []
    for r in range(G - 1):
        for c in range(G - 1):
            i = r * G + c
            tri += [[i, i + 1, i + G], [i + 1, i + G + 1, i + G]]
    faces = jnp.asarray(np.array(tri, np.int32))
    lm_index = jnp.arange(68) % PN
    f = float(S) * 1.2
    inmat = jnp.asarray(
        [[[f, 0.0, S / 2.0], [0.0, f, S / 2.0], [0.0, 0.0, 1.0]]]
    )

    def fit3dmm_fn(imgs, masks, lms):
        # the render path reads the mesh size off the param shapes, so
        # the reduced PN-point mesh needs no special handling
        B = imgs.shape[0]
        return fit_3dmm(
            geo_p, tex_p, jnp.asarray(imgs), jnp.asarray(masks),
            jnp.asarray(lms), jnp.tile(inmat, (B, 1, 1)), faces,
            lm_index, skinmask=jnp.ones((PN,)),
            stage1_iters=fit_iters[0], stage2_iters=fit_iters[1],
            chunk=min(512, S * S),
        )

    return {
        "bisenet_apply": bisenet_apply,
        "fan_apply": fan_apply,
        "netg_apply": netg_apply,
        "fit3dmm_fn": fit3dmm_fn,
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
