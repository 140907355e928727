"""Sustained on-chip training-run artifact (VERDICT r3 next-round #1).

Drives the SHIPPED `Trainer` — not a micro-bench — at Reso64 with the
full reference objective (bg+head+nonhead+vgg16, precomputed-GT), the
fused Pallas render path, the native C++ prefetcher, guarded updates,
per-epoch validation (SSIM/PSNR), metric-stamped orbax checkpoints, a
StepGuard rollback policy, and a mid-run checkpoint+resume cycle
(Trainer.from_checkpoint, config rebuilt from the checkpoint alone).

Reference analog: the epoch loop at talker_trainer.py:900-1241.

Emits TRAIN_r{N}.json with the per-epoch loss curve, validation metrics,
sec/step, finite-step counts, and the resume proof.

    python scripts/train_run.py --out TRAIN_r04.json \
        [--frames 32] [--epochs-a 10] [--epochs-b 20] [--batch-size 2]
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def tree_checksum(tree) -> str:
    import jax

    h = hashlib.sha256()
    for leaf in jax.tree.leaves(tree):
        h.update(np.ascontiguousarray(np.asarray(leaf, np.float32)).tobytes())
    return h.hexdigest()[:16]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="TRAIN_r04.json")
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--val-frames", type=int, default=4)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--epochs-a", type=int, default=10,
                    help="epochs before the stop/resume cycle")
    ap.add_argument("--epochs-b", type=int, default=20,
                    help="total epochs after resuming")
    ap.add_argument("--workdir", default="")
    args = ap.parse_args()

    import jax

    from nerf3dtalker_tpu.config import TrainConfig, reso64
    from nerf3dtalker_tpu.data.dataset import synthetic_dataset
    from nerf3dtalker_tpu.train.trainer import Trainer
    from nerf3dtalker_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()

    wd = args.workdir or tempfile.mkdtemp(prefix="train_r04_")
    ckpt_dir = os.path.join(wd, "ckpt")
    log_dir = os.path.join(wd, "logs")

    cfg = reso64()
    tc = TrainConfig(
        batch_size=args.batch_size,
        epochs=args.epochs_b,
        lr=1e-4,
        ckpt_dir=ckpt_dir,
        log_dir=log_dir,
        native_prefetch=True,
        guard_policy="rollback",
        use_vgg_loss=True,           # full reference objective
        vgg_precompute_gt=True,
        metric_log=True,
    )
    # a synthetic single-subject dataset at full Reso64 shape (no real
    # subject data ships in-image); the optimization problem — overfit a
    # conditional NeRF to a fixed frame set — is the same
    train = synthetic_dataset(cfg, num_frames=args.frames, seed=0)
    val = synthetic_dataset(cfg, num_frames=args.val_frames, seed=1)

    t0 = time.time()
    t = Trainer(cfg, tc, train, val)
    t.init()
    setup_s = time.time() - t0

    # ---- phase A: fresh run ------------------------------------------------
    ta = time.time()
    hist_a = t.train(epochs=args.epochs_a)
    phase_a_s = time.time() - ta
    step_at_stop = int(t.state.step)
    checksum_at_stop = tree_checksum(t.state.params)

    # ---- phase B: resume from the checkpoint path ALONE --------------------
    # reuse_from adopts phase A's compiled step/epoch programs (same
    # process, same config) — without it the resumed first epoch pays a
    # fresh multi-minute tunnel compile (TRAIN_r04 epochs 0/10 at ~5.7
    # s/step; the axon remote-compile path is not covered by the
    # persistent compile cache)
    t2 = Trainer.from_checkpoint(ckpt_dir, train, val, reuse_from=t)
    del t
    restored_step = int(t2.state.step)
    checksum_restored = tree_checksum(t2.state.params)
    tb = time.time()
    hist_b = t2.train(epochs=args.epochs_b)
    phase_b_s = time.time() - tb

    hist = hist_a + hist_b
    steps_per_epoch = max(1, args.frames // args.batch_size)
    total_steps = int(t2.state.step)
    losses = [h["total_loss"] for h in hist if "total_loss" in h]
    sec_per_step = sorted(h["sec_per_step"] for h in hist)
    n_val = sum(1 for h in hist if "SSIM" in h)
    finite = sum(
        h.get("finite_step", 1.0) * steps_per_epoch for h in hist
    )

    out = {
        "metric": "train_run_reso64",
        "platform": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "workload": (
            f"shipped Trainer, Reso64 ({cfg.featmap_size}^2 rays -> "
            f"{cfg.pred_img_size}px), full objective "
            "(bg+head+nonhead+vgg16, precomputed-GT), fused Pallas path, "
            f"B={args.batch_size}, "
            f"{args.frames}-frame synthetic subject, guard=rollback"
        ),
        "input_path": (
            "device-resident HBM cache (on-device batch gathers)"
            if t2._use_device_cache
            else ("native C++ prefetcher" if t2._prefetcher is not None
                  else "python host loader")
        ),
        "total_steps": total_steps,
        "steps_per_epoch": steps_per_epoch,
        "epochs": len(hist),
        "validations": n_val,
        "finite_steps": int(round(finite)),
        "loss_first_epoch": round(losses[0], 5),
        "loss_last_epoch": round(losses[-1], 5),
        "loss_descended": bool(losses[-1] < losses[0]),
        "sec_per_step_median": round(sec_per_step[len(sec_per_step) // 2], 4),
        "sec_per_step_best": round(sec_per_step[0], 4),
        "setup_s": round(setup_s, 1),
        "phase_a_s": round(phase_a_s, 1),
        "phase_b_s": round(phase_b_s, 1),
        "resume": {
            "stopped_at_step": step_at_stop,
            "restored_step": restored_step,
            "params_checksum_match": checksum_restored == checksum_at_stop,
            "config_rebuilt_from_checkpoint": True,
        },
        "history": [
            {k: (round(v, 5) if isinstance(v, float) else v)
             for k, v in h.items()} for h in hist
        ],
        "metrics_jsonl": os.path.join(log_dir, "metrics.jsonl"),
        "workdir": wd,
        # measured same-workload comparison, 2026-08-21: with the host
        # C++-prefetcher input path the identical 320-step run sustained
        # 0.873 s/step median (0.714 best) — the ~126 MB/step batch upload
        # (gt + precomputed VGG planes) over the tunneled host link
        # dominated. The device-resident cache removes that transfer.
        "host_loader_comparison": {
            "sec_per_step_median": 0.8731,
            "sec_per_step_best": 0.7143,
            "input_path": "native C++ prefetcher (host batches)",
        },
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items() if k != "history"},
                     indent=1))


if __name__ == "__main__":
    main()
