"""Video compositing / IO utilities (offline, numpy + ffmpeg CLI).

Equivalents of reference `s_utils/paste_pic.py` (composite the generated
face crop back into the original full-frame video with a feathered seam),
`s_utils/videoio.py` (ffmpeg mux of frames + audio), and the
`face_enhancer` interface (`s_utils/face_enhancer.py:26-123` gfpgan /
RestoreFormer wrappers — here a pluggable callable with an identity
default, since enhancer weights are external).
"""

from __future__ import annotations

import os
import subprocess
from typing import Callable, Optional, Sequence, Tuple

import numpy as np


def paste_crop(
    full_frame: np.ndarray,      # [H, W, 3]
    crop: np.ndarray,            # [h, w, 3] generated face
    box: Tuple[int, int, int, int],   # x1, y1, x2, y2 in full-frame coords
    feather: int = 10,
) -> np.ndarray:
    """Paste with a feathered alpha seam (paste_pic semantics)."""
    x1, y1, x2, y2 = box
    h, w = y2 - y1, x2 - x1
    crop_r = _resize_bilinear(crop, (h, w))
    mask = np.ones((h, w, 1), np.float32)
    if feather > 0:
        ramp = np.linspace(0, 1, feather, dtype=np.float32)
        mask[:feather] *= ramp[:, None, None]
        mask[-feather:] *= ramp[::-1][:, None, None]
        mask[:, :feather] *= ramp[None, :, None]
        mask[:, -feather:] *= ramp[::-1][None, :, None]
    out = full_frame.astype(np.float32).copy()
    out[y1:y2, x1:x2] = crop_r * mask + out[y1:y2, x1:x2] * (1 - mask)
    return out.astype(full_frame.dtype)


def _resize_bilinear(img: np.ndarray, hw: Tuple[int, int]) -> np.ndarray:
    import jax
    import jax.numpy as jnp

    return np.asarray(
        jax.image.resize(jnp.asarray(img.astype(np.float32)),
                         (hw[0], hw[1], img.shape[-1]), method="linear")
    )


def write_video(
    frames: Sequence[np.ndarray],
    path: str,
    fps: int = 25,
    audio_path: Optional[str] = None,
) -> None:
    """Pipe raw frames to ffmpeg, optionally muxing audio
    (videoio.py save_video_with_watermark minus the watermark)."""
    h, w = frames[0].shape[:2]
    cmd = [
        "ffmpeg", "-y", "-f", "rawvideo", "-pix_fmt", "rgb24",
        "-s", f"{w}x{h}", "-r", str(fps), "-i", "-",
    ]
    if audio_path:
        cmd += ["-i", audio_path, "-c:a", "aac", "-shortest"]
    cmd += ["-c:v", "libx264", "-pix_fmt", "yuv420p", path]
    try:
        proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                                stderr=subprocess.DEVNULL)
    except FileNotFoundError:
        # no ffmpeg on this host: fall back to per-frame PNGs next to the
        # requested path so the render is never lost
        import os
        import warnings

        d = os.path.splitext(path)[0] + "_frames"
        os.makedirs(d, exist_ok=True)
        for i, f in enumerate(frames):
            f01 = f.astype(np.float32) / 255.0 if f.dtype == np.uint8 else f
            write_png(os.path.join(d, f"{i:05d}.png"), f01)
        msg = f"ffmpeg not found; wrote {len(frames)} PNGs to {d}"
        if audio_path:
            import shutil

            dst = os.path.join(d, os.path.basename(audio_path))
            try:
                shutil.copy(audio_path, dst)
                msg += f"; audio track not muxed, copied to {dst}"
            except OSError:
                msg += f"; audio track {audio_path} not muxed (copy failed)"
        warnings.warn(msg)
        return
    for f in frames:
        u8 = np.clip(f * 255 if f.dtype != np.uint8 else f, 0, 255).astype(np.uint8)
        proc.stdin.write(u8.tobytes())
    proc.stdin.close()
    proc.wait()


def identity_enhancer(frames: np.ndarray) -> np.ndarray:
    """Default no-op enhancer (the gfpgan slot)."""
    return frames


def unsharp_enhancer(frames: np.ndarray, amount: float = 0.5) -> np.ndarray:
    """Cheap sharpen as a built-in enhancer option."""
    from scipy.ndimage import gaussian_filter

    out = []
    for f in frames:
        blur = gaussian_filter(f, sigma=(1, 1, 0))
        out.append(np.clip(f + amount * (f - blur), 0, 1))
    return np.stack(out)


def gfpgan_enhancer(params, model=None, batch: int = 4):
    """Enhancer backed by the GFPGAN-v1-clean restorer
    (models/gfpgan.py; the reference's gfpgan slot,
    face_enhancer.py:51-60). Supply converted GFPGANv1.4 weights via
    models.gfpgan.convert_gfpgan_clean."""

    def run(frames: np.ndarray) -> np.ndarray:
        from nerf3dtalker_tpu.models.gfpgan import restore_faces

        return restore_faces(params, frames, model=model, batch=batch)

    return run


def enhance_frames(
    frames: np.ndarray,
    enhancer: Callable[[np.ndarray], np.ndarray] = identity_enhancer,
) -> np.ndarray:
    """face_enhancer.py interface: batch frames through an enhancer."""
    return enhancer(frames)


def write_png(path: str, img01: np.ndarray) -> None:
    """Write a [H, W, 3] float image in [0, 1] as a viewable PNG
    (falls back to .npy when PIL is unavailable)."""
    arr = np.clip(np.asarray(img01) * 255.0, 0, 255).astype(np.uint8)
    try:
        from PIL import Image

        Image.fromarray(arr).save(path)
    except ImportError:
        np.save(path + ".npy", img01)
