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
    """Random dataset for tests/benchmarks at a given NeRFConfig scale."""
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
