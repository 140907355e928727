"""Add degraded-conditioning renders to an existing train_r05 workdir's
renders.npz (one-off for runs made before train_r05.py dumped them).

Rebuilds the Trainer from the run's checkpoint (config embedded), renders
the train split with audio_exp zeroed — REAL model outputs under
conditioning mismatch, the regime the reference's VQ refinement repairs —
and rewrites renders.npz with a `train_degraded` array.

    python scripts/augment_renders.py --workdir /tmp/train_r05_wd
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", required=True)
    ap.add_argument("--frames", type=int, default=40)
    args = ap.parse_args()

    from nerf3dtalker_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()

    from nerf3dtalker_tpu.config import reso64
    from nerf3dtalker_tpu.data.dataset import coherent_subject
    from nerf3dtalker_tpu.train.trainer import Trainer

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from train_r05 import eval_split

    cfg = reso64()
    path = os.path.join(args.workdir, "renders.npz")
    data = dict(np.load(path))
    n_val = len(data["val_gt"])
    train = coherent_subject(cfg, num_frames=args.frames, t0=0)
    val = coherent_subject(cfg, num_frames=n_val, t0=args.frames)
    t = Trainer.from_checkpoint(os.path.join(args.workdir, "ckpt"), train)

    m_tr, deg_tr = eval_split(
        t, train, {"audio_exp": np.zeros_like(train.arrays["audio_exp"])}
    )
    m_va, deg_va = eval_split(
        t, val, {"audio_exp": np.zeros_like(val.arrays["audio_exp"])}
    )
    print("degraded train render:", m_tr, " val:", m_va)

    data["train_degraded"] = deg_tr.astype(np.float32)
    data["val_degraded"] = deg_va.astype(np.float32)
    np.savez(path, **data)
    print("updated", path)


if __name__ == "__main__":
    main()
