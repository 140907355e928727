"""ctypes bindings for the native CPU runtime (native/nerf3dt_native.cpp).

Provides the C++ mel-spectrogram front-end and the threaded batch
prefetcher. Falls back gracefully (raises ImportError) when the shared
library hasn't been built: `g++ -O3 -shared -fPIC -std=c++17 -o
native/libnerf3dt_native.so native/nerf3dt_native.cpp -lpthread`.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "libnerf3dt_native.so",
)

_lib = None


def _build() -> None:
    """Compile the runtime in-place (fresh checkouts ship only the .cpp)."""
    import subprocess

    src = os.path.join(os.path.dirname(_LIB_PATH), "nerf3dt_native.cpp")
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        "-o", _LIB_PATH, src, "-lpthread",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
    except (OSError, subprocess.SubprocessError) as e:
        raise ImportError(
            f"native library not built and auto-build failed: {' '.join(cmd)}: {e}"
        ) from e


def _load():
    global _lib
    if _lib is None:
        if not os.path.exists(_LIB_PATH):
            _build()
        lib = ctypes.CDLL(_LIB_PATH)
        lib.n3d_mel_frames.restype = ctypes.c_int
        lib.n3d_mel_frames.argtypes = [ctypes.c_int] * 3
        lib.n3d_melspectrogram.restype = ctypes.c_int
        lib.n3d_melspectrogram.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float),
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ]
        lib.n3d_prefetcher_create.restype = ctypes.c_void_p
        lib.n3d_prefetcher_create.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_uint64,
        ]
        lib.n3d_prefetcher_next.restype = None
        lib.n3d_prefetcher_next.argtypes = [ctypes.c_void_p, ctypes.POINTER(ctypes.c_float)]
        lib.n3d_prefetcher_destroy.restype = None
        lib.n3d_prefetcher_destroy.argtypes = [ctypes.c_void_p]
        _lib = lib
    return _lib


def _fptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def melspectrogram_native(
    wav: np.ndarray,
    sr: int = 16000, n_fft: int = 800, hop: int = 200, win: int = 800,
    n_mels: int = 80, fmin: float = 55.0, fmax: float = 7600.0,
    preemph: float = 0.97, ref_level_db: float = 20.0,
    min_level_db: float = -100.0, max_abs_value: float = 4.0,
) -> np.ndarray:
    """C++ mel pipeline; same contract as data.mel.melspectrogram."""
    lib = _load()
    wav = np.ascontiguousarray(wav, np.float32)
    frames = lib.n3d_mel_frames(len(wav), n_fft, hop)
    out = np.empty((n_mels, frames), np.float32)
    got = lib.n3d_melspectrogram(
        _fptr(wav), len(wav), _fptr(out), sr, n_fft, hop, win, n_mels,
        fmin, fmax, preemph, ref_level_db, min_level_db, max_abs_value,
    )
    assert got == frames, (got, frames)
    return out


class NativePrefetcher:
    """Threaded shuffled batch prefetcher over an in-memory [N, D] f32
    array (the C++ replacement for the reference's num_workers DataLoader
    processes)."""

    def __init__(self, data: np.ndarray, batch: int, seed: int = 0):
        self._lib = _load()
        self._data = np.ascontiguousarray(data, np.float32)  # keep alive
        n, d = self._data.shape
        self.batch = batch
        self.item_size = d
        self._h = self._lib.n3d_prefetcher_create(
            _fptr(self._data), n, d, batch, seed
        )

    def next(self) -> np.ndarray:
        out = np.empty((self.batch, self.item_size), np.float32)
        self._lib.n3d_prefetcher_next(self._h, _fptr(out))
        return out

    def close(self):
        if self._h:
            self._lib.n3d_prefetcher_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass


class FramePrefetcher:
    """Route a FrameDataset's training batches through the C++ threaded
    prefetcher (the native replacement for the reference's num_workers
    DataLoader processes, data_loader_xgaze_new.py:780-808).

    Per-frame fields are packed once into a flat [T, D] f32 matrix; the
    native thread shuffles, gathers and double-buffers batches off the
    Python thread, and rows are split back into the train-step batch dict
    on the way out (the xy ray grid is tiled once up front).
    """

    _FIELDS = (
        ("gt_rgb", "images"), ("head_mask", "head_mask"), ("mels", "mels"),
        ("audio_exp", "audio_exp"), ("iden", "iden"), ("expr", "expr"),
        ("text", "text"), ("illu", "illu"), ("Rmat", "Rmat"),
        ("Tvec", "Tvec"), ("inv_inmat", "inv_inmat"),
    )

    def __init__(self, dataset, batch_size: int, seed: int = 0):
        T = dataset.num_frames
        self._shapes = {}
        # per-frame fields, plus any precomputed VGG activation planes
        self._fields = list(self._FIELDS) + [
            (f"vgg_f{i}", f"vgg_f{i}") for i in range(4)
            if f"vgg_f{i}" in dataset.arrays
        ]
        cols = []
        for out_key, key in self._fields:
            a = np.asarray(dataset.arrays[key], np.float32)
            self._shapes[out_key] = a.shape[1:]
            cols.append(a.reshape(T, -1))
        flat = np.concatenate(cols, axis=1)
        self._pf = NativePrefetcher(flat, batch_size, seed)
        self._xy = np.tile(dataset.xy, (batch_size, 1, 1))
        self.steps_per_epoch = max(1, T // batch_size)

    def next(self) -> dict:
        rows = self._pf.next()
        out, o = {}, 0
        for out_key, _ in self._fields:
            shp = self._shapes[out_key]
            n = int(np.prod(shp)) if shp else 1
            out[out_key] = rows[:, o : o + n].reshape((rows.shape[0],) + shp)
            o += n
        out["xy"] = self._xy
        return out

    def close(self):
        self._pf.close()
