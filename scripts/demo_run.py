"""On-hardware serving/demo artifact (VERDICT r3 next-round #9).

Drives the SHIPPED `cli animate` at Reso64 on the chip — wav -> per-frame
mel chunks -> Audio2Style -> batched fused HeadNeRF re-render -> frame
stack — and records warm steady-state ms/frame plus a frame checksum so
the wav->video composition has a recorded, reproducible on-hardware run.

Reference analog: the re-render loop at FittingSingleImage_new.py:918-966.

    python scripts/demo_run.py --out DEMO_r04.json [--frames 50]
"""

from __future__ import annotations

import argparse
import contextlib
import hashlib
import io
import json
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="DEMO_r04.json")
    ap.add_argument("--frames", type=int, default=50)
    ap.add_argument("--chunk", type=int, default=4)
    args = ap.parse_args()

    import jax

    from nerf3dtalker_tpu import cli
    from nerf3dtalker_tpu.data.tts import synthesize_placeholder
    from nerf3dtalker_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()
    wd = tempfile.mkdtemp(prefix="demo_r04_")
    wav = synthesize_placeholder(
        "the quick brown fox jumps over the lazy dog and keeps talking",
        path=os.path.join(wd, "demo.wav"),
    )
    frames_npy = os.path.join(wd, "frames.npy")

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        cli.main([
            "animate", "--wav", wav, "--featmap-size", "64",
            "--img-size", "512", "--chunk", str(args.chunk),
            "--max-frames", str(args.frames), "--bench-serving",
            "--out", frames_npy,
        ])
    rec = json.loads(buf.getvalue().strip().splitlines()[-1])

    frames = np.load(frames_npy)
    checksum = hashlib.sha256(
        np.ascontiguousarray(frames.astype(np.float32)).tobytes()
    ).hexdigest()[:16]
    out = {
        "metric": "serving_ms_per_frame_reso64",
        # headline = steady-state chunked-render compute rate (chained
        # in-jit timing); wall-clock incl. frame download rides alongside
        # (over the tunneled chip the host link dominates wall)
        "value": rec.get("ms_per_frame_compute", rec.get("ms_per_frame")),
        "ms_per_frame_wall_incl_transfer": rec.get("ms_per_frame"),
        "unit": "ms/frame",
        "platform": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "workload": (
            "cli animate: wav -> mel -> Audio2Style -> batched fused "
            f"HeadNeRF Reso64 re-render, chunk={args.chunk}, "
            f"{rec['frames']} frames at {rec['size']}"
        ),
        "frames": rec["frames"],
        "size": rec["size"],
        "frames_finite": bool(np.isfinite(frames).all()),
        "frames_in_range": bool((frames >= 0).all() and (frames <= 1).all()),
        "frame_stack_sha256_16": checksum,
        "wav_sha256_16": hashlib.sha256(
            open(wav, "rb").read()
        ).hexdigest()[:16],
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
