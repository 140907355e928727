"""Array-based training dataset.

The reference's `GazeDataset_normailzed_from_hdf`
(XGaze_utils/data_loader_xgaze_new.py:845-1239) runs Wav2Lip + S3FD +
Deep3DFaceRecon inference *inside* `__getitem__` (:938-1066), reloading
checkpoints per item. Here (SURVEY.md §7 'Precompute, don't inline') all of
that is an offline preprocessing stage emitting arrays; training input is
pure array slicing — no process-boundary workers, no per-item model loads.

Schema per subject (all numpy, frame-major):
  images     [T, H, W, 3] float32 in [0,1]
  head_mask  [T, H, W, 1] float32
  mels       [T, 80, 16]            per-frame mel chunks
  audio_exp  [T, 64]                SadTalker exp of the lip-synced frame
  iden/text/illu [T, ...]           3DMM codes from *_nl3dmm.pkl
  expr       [T, 79]
  Rmat [T,3,3], Tvec [T,3], inv_inmat [T,3,3]
"""

from __future__ import annotations

from typing import Dict, Iterator, Optional

import numpy as np

REQUIRED_KEYS = (
    "images", "head_mask", "mels", "audio_exp",
    "iden", "expr", "text", "illu", "Rmat", "Tvec", "inv_inmat",
)

# (train-batch key, dataset array key) — shared by the host batch(), the
# device-cache gather, and the native prefetcher's packing
BATCH_FIELDS = (
    ("gt_rgb", "images"), ("head_mask", "head_mask"), ("mels", "mels"),
    ("audio_exp", "audio_exp"), ("iden", "iden"), ("expr", "expr"),
    ("text", "text"), ("illu", "illu"), ("Rmat", "Rmat"),
    ("Tvec", "Tvec"), ("inv_inmat", "inv_inmat"),
)


class FrameDataset:
    """In-memory per-frame dataset with train/val split and batching."""

    def __init__(self, arrays: Dict[str, np.ndarray], xy: np.ndarray):
        missing = [k for k in REQUIRED_KEYS if k not in arrays]
        if missing:
            raise ValueError(f"missing dataset keys: {missing}")
        T = arrays["images"].shape[0]
        for k, v in arrays.items():
            if v.shape[0] != T:
                raise ValueError(f"{k} has {v.shape[0]} frames, expected {T}")
        self.arrays = arrays
        self.xy = xy  # [1, N_r, 2]
        self.num_frames = T

    def __len__(self) -> int:
        return self.num_frames

    def batch(self, idx: np.ndarray) -> Dict[str, np.ndarray]:
        b = {
            "gt_rgb": self.arrays["images"][idx],
            "head_mask": self.arrays["head_mask"][idx],
            "mels": self.arrays["mels"][idx],
            "audio_exp": self.arrays["audio_exp"][idx],
            "iden": self.arrays["iden"][idx],
            "expr": self.arrays["expr"][idx],
            "text": self.arrays["text"][idx],
            "illu": self.arrays["illu"][idx],
            "Rmat": self.arrays["Rmat"][idx],
            "Tvec": self.arrays["Tvec"][idx],
            "inv_inmat": self.arrays["inv_inmat"][idx],
        }
        for i in range(4):
            k = f"vgg_f{i}"       # precomputed masked-GT VGG activations
            if k in self.arrays:
                b[k] = self.arrays[k][idx]
        b["xy"] = np.tile(self.xy, (len(idx), 1, 1))
        return b

    def precompute_gt_vgg(
        self, vgg_params, bg_value: float = 1.0, compute_dtype=None,
        batch: int = 4, store_dtype=np.float16,
    ) -> None:
        """Precompute the masked-GT VGG block activations for every frame
        (they do not depend on parameters — the target branch of the
        perceptual loss, HeadNeRFLossUtils.py:148-153 — so computing them
        once here halves the VGG cost of every training step).

        Stored as float16 by default: the activation cache is ~12 MB/frame
        at f16 (~24 at f32), and the perceptual L1 is insensitive at that
        precision (the step already runs the net in bf16 under AMP).
        """
        import jax.numpy as jnp

        from nerf3dtalker_tpu.models.perceptual import vgg_features

        outs = [[] for _ in range(4)]
        T = self.num_frames
        for s in range(0, T, batch):
            gt = jnp.asarray(self.arrays["images"][s : s + batch])
            head = jnp.asarray(
                (self.arrays["head_mask"][s : s + batch] >= 0.5)
            ).astype(gt.dtype)
            masked = gt * head + bg_value * (1.0 - head)
            feats = vgg_features(vgg_params, masked, compute_dtype=compute_dtype)
            for i, f in enumerate(feats):
                outs[i].append(np.asarray(f).astype(store_dtype))
        for i in range(4):
            self.arrays[f"vgg_f{i}"] = np.concatenate(outs[i], axis=0)

    def epoch(
        self, batch_size: int, rng: Optional[np.random.Generator] = None,
        drop_last: bool = True,
    ) -> Iterator[Dict[str, np.ndarray]]:
        order = np.arange(self.num_frames)
        if rng is not None:
            rng.shuffle(order)
        end = self.num_frames - (self.num_frames % batch_size) if drop_last else self.num_frames
        for i in range(0, end, batch_size):
            yield self.batch(order[i : i + batch_size])

    # ------------------------------------------------------- device cache

    def nbytes(self) -> int:
        return sum(int(np.asarray(v).nbytes) for v in self.arrays.values())

    def to_device(self, batch_size: int) -> None:
        """Push every per-frame array (incl. precomputed VGG planes) to the
        accelerator once; `device_batch` then gathers training batches
        ON-device, so the per-step host->device traffic is just the frame
        indices. At Reso64 with VGG planes a B=2 batch is ~126 MB — over a
        slow host link that upload, not compute, dominates the step."""
        import jax.numpy as jnp

        self._dev = {k: jnp.asarray(v) for k, v in self.arrays.items()}
        self._dev_xy = jnp.asarray(np.tile(self.xy, (batch_size, 1, 1)))

    def device_batch(self, idx: np.ndarray) -> Dict:
        """On-device gather of a batch (requires `to_device`)."""
        import jax.numpy as jnp

        i = jnp.asarray(np.asarray(idx, np.int32))
        d = self._dev
        b = {
            out: jnp.take(d[src], i, 0)
            for out, src in BATCH_FIELDS if src in d
        }
        for j in range(4):
            k = f"vgg_f{j}"
            if k in d:
                b[k] = jnp.take(d[k], i, 0)
        b["xy"] = self._dev_xy
        return b


def synthetic_dataset(
    cfg, num_frames: int = 8, seed: int = 0
) -> FrameDataset:
    """Random dataset for tests/benchmarks at a given NeRFConfig scale.

    Per-pixel i.i.d. noise — deliberately UNLEARNABLE. Use it to exercise
    machinery (step shapes, throughput, resume); use
    :func:`coherent_subject` when the run must demonstrate learning.
    """
    from nerf3dtalker_tpu.utils.camera import base_cam, ray_grid

    rng = np.random.default_rng(seed)
    xy, _ = ray_grid(cfg.featmap_size)
    cam = base_cam(cfg.featmap_size)
    T, S = num_frames, cfg.pred_img_size
    f32 = np.float32
    arrays = {
        "images": rng.uniform(0, 1, (T, S, S, 3)).astype(f32),
        "head_mask": (rng.uniform(0, 1, (T, S, S, 1)) > 0.4).astype(f32),
        "mels": rng.standard_normal((T, 80, 16)).astype(f32),
        "audio_exp": rng.standard_normal((T, 64)).astype(f32) * 0.1,
        "iden": rng.standard_normal((T, 100)).astype(f32) * 0.1,
        "expr": rng.standard_normal((T, 79)).astype(f32) * 0.1,
        "text": rng.standard_normal((T, 100)).astype(f32) * 0.1,
        "illu": rng.standard_normal((T, 27)).astype(f32) * 0.1,
        "Rmat": np.tile(cam.Rmat, (T, 1, 1)).astype(f32),
        "Tvec": np.tile(cam.Tvec.reshape(1, 3), (T, 1)).astype(f32),
        "inv_inmat": np.tile(cam.inv_inmat, (T, 1, 1)).astype(f32),
    }
    return FrameDataset(arrays, xy)


def _soft_ellipse(xx, yy, cx, cy, rx, ry, edge):
    """Anti-aliased inside-ness of an axis-aligned ellipse in [0,1]."""
    d = np.sqrt(((xx - cx) / rx) ** 2 + ((yy - cy) / ry) ** 2)
    # smoothstep from 1 (inside) to 0 (outside) across ~edge in d units
    t = np.clip((d - 1.0) / edge + 0.5, 0.0, 1.0)
    return (1.0 - t * t * (3.0 - 2.0 * t)).astype(np.float32)


def talking_signals(num_frames: int, t0: int = 0):
    """The two smooth, independent per-frame drivers of the synthetic
    talking head: ``a`` (mouth openness, [0,1]) and ``b`` (brow raise,
    [-1,1]). Deterministic functions of the absolute frame index, so
    train/val splits drawn from different index ranges share the same
    underlying 'performance'."""
    t = np.arange(t0, t0 + num_frames, dtype=np.float64)
    a = 0.5 + 0.5 * np.sin(2.0 * np.pi * t / 14.0 + 0.7)
    b = np.sin(2.0 * np.pi * t / 9.0 + 1.9)
    return a.astype(np.float32), b.astype(np.float32)


def render_talking_frame(S: int, a: float, b: float):
    """One frame of the procedural talking head: a smooth, 3D-consistent
    face pattern on a white background whose mouth aperture is ``a`` and
    brow height is ``b``. Returns (image [S,S,3], head_mask [S,S,1]).

    All shapes are analytic and anti-aliased, so the target is exactly the
    kind of smooth conditional image set the reference fits per subject
    (talker_trainer.py:704-714 trains on one subject's frames)."""
    ys, xs = np.mgrid[0:S, 0:S].astype(np.float32)
    xx, yy = (xs + 0.5) / S, (ys + 0.5) / S
    e = 2.0 / S  # AA edge width in normalized ellipse-distance units
    img = np.ones((S, S, 3), np.float32)

    # head: shaded ellipse
    head = _soft_ellipse(xx, yy, 0.5, 0.52, 0.30, 0.38, e)
    r2 = ((xx - 0.5) / 0.30) ** 2 + ((yy - 0.52) / 0.38) ** 2
    shade = (1.0 - 0.25 * np.clip(r2, 0, 1)).astype(np.float32)
    skin = np.stack([0.85 * shade, 0.68 * shade, 0.58 * shade], -1)
    img = img * (1 - head[..., None]) + skin * head[..., None]

    def paint(alpha, color):
        nonlocal img
        img = img * (1 - alpha[..., None]) + np.asarray(
            color, np.float32
        ) * alpha[..., None]

    # eyes (static)
    for sx in (-1.0, 1.0):
        paint(_soft_ellipse(xx, yy, 0.5 + 0.12 * sx, 0.42, 0.042, 0.030, e),
              (0.13, 0.18, 0.40))
    # brows: vertical position rides ONLY on b (the audio_exp channel)
    by = 0.345 - 0.040 * float(b)
    for sx in (-1.0, 1.0):
        paint(_soft_ellipse(xx, yy, 0.5 + 0.12 * sx, by, 0.062, 0.016, e),
              (0.22, 0.13, 0.08))
    # nose (static)
    paint(_soft_ellipse(xx, yy, 0.5, 0.55, 0.030, 0.055, e),
          (0.75, 0.55, 0.47))
    # mouth: vertical aperture rides ONLY on a (the mel channel)
    ry = 0.015 + 0.065 * float(a)
    paint(_soft_ellipse(xx, yy, 0.5, 0.70, 0.095, ry, e),
          (0.38, 0.10, 0.13))

    mask = head[..., None]
    return img, mask.astype(np.float32)


def talking_mels(a: np.ndarray, seed: int = 7) -> np.ndarray:
    """Deterministic mel-like chunks [T, 80, 16] whose band structure
    encodes mouth openness ``a`` — a synthetic formant shift: energy moves
    from a low band (closed) to a high band (open), over a fixed smooth
    background spectrum. Audio2Style must decode ``a`` from these for the
    render to be right; nothing else in the batch carries ``a``."""
    rng = np.random.default_rng(seed)
    mel_axis = np.arange(80, dtype=np.float32)
    low = np.exp(-0.5 * ((mel_axis - 18.0) / 6.0) ** 2)
    high = np.exp(-0.5 * ((mel_axis - 52.0) / 7.0) ** 2)
    base = rng.standard_normal((80,)).astype(np.float32)
    base = np.convolve(base, np.ones(9) / 9.0, mode="same")  # smooth
    tramp = np.linspace(0.8, 1.2, 16, dtype=np.float32)[None, :]
    out = []
    for av in np.asarray(a, np.float32):
        spec = 0.25 * base + (1.0 - av) * low + av * high   # [80]
        out.append(spec[:, None] * tramp)                    # [80, 16]
    return np.stack(out).astype(np.float32)


def coherent_subject(
    cfg, num_frames: int = 40, seed: int = 0, t0: int = 0
) -> FrameDataset:
    """A LEARNABLE synthetic subject: smooth frame-consistent face images
    where the per-frame variation is carried ONLY by the audio pathway —
    mouth aperture by the mel chunks (via Audio2Style) and brow height by
    ``audio_exp`` (the SadTalker-exp slot that overwrites expr[:64],
    talker_trainer.py:853). All 3DMM codes and the camera are constant, so
    shuffling mels or zeroing audio_exp provably destroys the only signal
    that explains the moving regions — the ablation rows of TRAIN_r05.

    ``t0`` offsets the frame indices so a val split can hold out unseen
    (mouth, brow) combinations of the same performance.
    """
    from nerf3dtalker_tpu.utils.camera import base_cam, ray_grid

    rng = np.random.default_rng(seed + 101)
    xy, _ = ray_grid(cfg.featmap_size)
    cam = base_cam(cfg.featmap_size)
    T, S = num_frames, cfg.pred_img_size
    f32 = np.float32
    a, b = talking_signals(T, t0=t0)
    imgs = np.empty((T, S, S, 3), f32)
    masks = np.empty((T, S, S, 1), f32)
    for i in range(T):
        imgs[i], masks[i] = render_talking_frame(S, a[i], b[i])
    # audio_exp: brow signal along a fixed direction + constant offset
    u = rng.standard_normal(64).astype(f32)
    u /= np.linalg.norm(u)
    w = rng.standard_normal(64).astype(f32) * 0.05
    audio_exp = b[:, None] * u[None, :] * 0.5 + w[None, :]
    const = lambda d, s=0.1: np.tile(
        (rng.standard_normal(d) * s).astype(f32)[None], (T, 1)
    )
    arrays = {
        "images": imgs,
        "head_mask": masks,
        "mels": talking_mels(a),
        "audio_exp": audio_exp.astype(f32),
        "iden": const(100),
        "expr": const(79),
        "text": const(100),
        "illu": const(27),
        "Rmat": np.tile(cam.Rmat, (T, 1, 1)).astype(f32),
        "Tvec": np.tile(cam.Tvec.reshape(1, 3), (T, 1)).astype(f32),
        "inv_inmat": np.tile(cam.inv_inmat, (T, 1, 1)).astype(f32),
    }
    return FrameDataset(arrays, xy)
