"""Convergence artifact (VERDICT r4 next-round #1): the shipped Trainer
learns a LEARNABLE audio-conditioned subject at Reso64.

Unlike TRAIN_r04 (i.i.d. noise frames — machinery proof only), the
dataset here is `coherent_subject`: smooth frame-consistent face images
whose mouth aperture rides ONLY on the mel chunks (through Audio2Style)
and brow height ONLY on audio_exp (the expr[:64] overwrite,
talker_trainer.py:853). Success criteria:

  * train PSNR >= 28 and train SSIM >= 0.9 (monotone climb),
  * val PSNR (held-out frames of the same performance) clearly climbs,
  * ablations: shuffled mels and zeroed audio_exp each cost > 1 dB —
    the audio pathway is load-bearing, not decorative.

Also dumps the final train/val renders (+ GT + masks + the openness/brow
signals) to `renders.npz` in the workdir — the real-NeRF-render input the
VQ refinement artifact (VERDICT r4 #2) consumes.

Reference analog: talker_trainer.py:1087-1150 (train loop with SSIM/PSNR
stamped checkpoints).

    python scripts/train_r05.py --out TRAIN_r05.json [--epochs 150]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def eval_split(t, ds, batch_override=None):
    """Mean PSNR/SSIM of the trainer's deterministic renders over a
    dataset, optionally with ablated audio inputs."""
    from nerf3dtalker_tpu.utils.metrics import psnr, ssim_rgb

    psnrs, ssims, imgs_out = [], [], []
    for s in range(0, len(ds), t.batch_size):
        idx = np.arange(s, min(s + t.batch_size, len(ds)))
        if len(idx) < t.batch_size:
            break
        batch = ds.batch(idx)
        if batch_override:
            batch = {**batch, **{k: v[idx] for k, v in batch_override.items()}}
        imgs, _ = t.fns.eval_step(t.state.params, batch)
        imgs = np.asarray(imgs)
        for j in range(imgs.shape[0]):
            psnrs.append(float(psnr(imgs[j], batch["gt_rgb"][j])))
            ssims.append(float(ssim_rgb(imgs[j], batch["gt_rgb"][j])))
            imgs_out.append(imgs[j])
    return (
        {"PSNR": float(np.mean(psnrs)), "SSIM": float(np.mean(ssims))},
        np.stack(imgs_out),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="TRAIN_r05.json")
    ap.add_argument("--frames", type=int, default=40)
    ap.add_argument("--val-frames", type=int, default=8)
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--epochs", type=int, default=150)
    ap.add_argument("--max-epochs", type=int, default=500,
                    help="keep extending in chunks until train PSNR>=28 & "
                         "SSIM>=0.9 or this cap")
    ap.add_argument("--extend-chunk", type=int, default=75)
    ap.add_argument("--val-every", type=int, default=5)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--workdir", default="")
    ap.add_argument("--scale", default="reso64", choices=["reso64", "tiny"],
                    help="tiny = CPU smoke test of the whole artifact flow")
    args = ap.parse_args()

    import jax

    if args.scale == "tiny":
        # smoke mode must not grab the (shared, single) tunnel chip; the
        # axon plugin overrides JAX_PLATFORMS at boot, so force it here
        jax.config.update("jax_platforms", "cpu")

    from nerf3dtalker_tpu.config import NeRFConfig, TrainConfig, reso64
    from nerf3dtalker_tpu.data.dataset import coherent_subject, talking_signals
    from nerf3dtalker_tpu.train.trainer import Trainer
    from nerf3dtalker_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()

    wd = args.workdir or tempfile.mkdtemp(prefix="train_r05_")
    cfg = reso64() if args.scale == "reso64" else NeRFConfig(
        featmap_size=8, featmap_nc=32, pred_img_size=64,
        num_sample_coarse=8, mlp_hidden=32,
    )
    tc = TrainConfig(
        batch_size=args.batch_size,
        epochs=args.epochs,
        lr=args.lr,
        ckpt_dir=os.path.join(wd, "ckpt"),
        log_dir=os.path.join(wd, "logs"),
        guard_policy="rollback",
        use_vgg_loss=True,            # full reference objective
        vgg_precompute_gt=True,
        metric_log=True,
        val_every=args.val_every,
    )
    train = coherent_subject(cfg, num_frames=args.frames, t0=0)
    val = coherent_subject(cfg, num_frames=args.val_frames, t0=args.frames)
    train_eval = coherent_subject(cfg, num_frames=args.val_frames, t0=0)

    t0 = time.time()
    t = Trainer(cfg, tc, train, val, train_eval_data=train_eval)
    t.init()
    setup_s = time.time() - t0

    ta = time.time()
    epochs_done = 0
    while True:
        chunk = args.epochs if epochs_done == 0 else args.extend_chunk
        chunk = min(chunk, args.max_epochs - epochs_done)
        if chunk <= 0:
            break
        t.start_epoch = epochs_done
        hist = t.train(epochs=epochs_done + chunk)
        epochs_done += chunk
        tp = [h for h in hist if "TRAIN_PSNR" in h]
        if tp and tp[-1]["TRAIN_PSNR"] >= 28.0 and tp[-1]["TRAIN_SSIM"] >= 0.9:
            break
        print(f"[extend] epoch {epochs_done}: TRAIN_PSNR="
              f"{tp[-1]['TRAIN_PSNR'] if tp else float('nan'):.2f} "
              "— continuing", flush=True)
    train_s = time.time() - ta

    # ---- final full-split metrics + ablations ----------------------------
    final_train, train_renders = eval_split(t, train)
    final_val, val_renders = eval_split(t, val)
    rng = np.random.default_rng(0)
    perm = rng.permutation(len(train))
    while np.any(perm == np.arange(len(train))):     # full derangement
        perm = rng.permutation(len(train))
    abl_shuf, _ = eval_split(
        t, train, {"mels": train.arrays["mels"][perm]}
    )
    abl_zexp, degraded_renders = eval_split(
        t, train,
        {"audio_exp": np.zeros_like(train.arrays["audio_exp"])},
    )
    _, degraded_val = eval_split(
        t, val, {"audio_exp": np.zeros_like(val.arrays["audio_exp"])}
    )

    # renders for the VQ refinement stage (real NeRF outputs)
    a_tr, b_tr = talking_signals(args.frames, t0=0)
    a_va, b_va = talking_signals(args.val_frames, t0=args.frames)
    np.savez(
        os.path.join(wd, "renders.npz"),
        train_render=train_renders.astype(np.float32),
        train_gt=train.arrays["images"],
        train_mask=train.arrays["head_mask"],
        val_render=val_renders.astype(np.float32),
        val_gt=val.arrays["images"],
        val_mask=val.arrays["head_mask"],
        # REAL renders under conditioning mismatch (zeroed audio_exp) —
        # the reference's refinement regime: gen frames whose quality is
        # limited by imperfect conditioning, which the VQ stage repairs
        train_degraded=degraded_renders.astype(np.float32),
        val_degraded=degraded_val.astype(np.float32),
        a_train=a_tr, b_train=b_tr, a_val=a_va, b_val=b_va,
    )

    curve = [
        {k: (round(v, 5) if isinstance(v, float) else v)
         for k, v in h.items()} for h in hist
    ]
    psnr_curve = [(h["epoch"], h["TRAIN_PSNR"]) for h in hist
                  if "TRAIN_PSNR" in h]
    val_psnrs = [h["PSNR"] for h in hist if "PSNR" in h]
    sec_per_step = sorted(h["sec_per_step"] for h in hist)

    out = {
        "metric": "train_convergence_reso64",
        "platform": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "workload": (
            f"shipped Trainer, Reso64, full objective (bg+head+nonhead+"
            f"vgg16 precomputed-GT), fused Pallas render, fused BiLSTM, "
            f"B={args.batch_size}, lr={args.lr}, {args.frames}-frame "
            "coherent audio-conditioned subject (mouth<-mels, "
            "brow<-audio_exp), guard=rollback, device-cached input path"
        ),
        "dataset": "data/dataset.py:coherent_subject (learnable; "
                   "audio is the ONLY per-frame signal)",
        "total_steps": int(t.state.step),
        "epochs": len(hist),
        "sec_per_step_median": round(sec_per_step[len(sec_per_step) // 2], 4),
        "setup_s": round(setup_s, 1),
        "train_s": round(train_s, 1),
        "final_train": {k: round(v, 3) for k, v in final_train.items()},
        "final_val": {k: round(v, 3) for k, v in final_val.items()},
        "targets": {
            "train_psnr_ge_28": final_train["PSNR"] >= 28.0,
            "train_ssim_ge_0.9": final_train["SSIM"] >= 0.9,
            "val_psnr_climbs": (
                len(val_psnrs) >= 3 and val_psnrs[-1] > val_psnrs[0] + 3.0
            ),
        },
        "ablations": {
            "note": "audio pathway must be load-bearing: each row ablates "
                    "ONE audio input on the trained model over the full "
                    "train split",
            "intact_psnr": round(final_train["PSNR"], 3),
            "shuffled_mels_psnr": round(abl_shuf["PSNR"], 3),
            "shuffled_mels_delta_db": round(
                final_train["PSNR"] - abl_shuf["PSNR"], 3
            ),
            "zeroed_audio_exp_psnr": round(abl_zexp["PSNR"], 3),
            "zeroed_audio_exp_delta_db": round(
                final_train["PSNR"] - abl_zexp["PSNR"], 3
            ),
            "both_exceed_1db": bool(
                final_train["PSNR"] - abl_shuf["PSNR"] > 1.0
                and final_train["PSNR"] - abl_zexp["PSNR"] > 1.0
            ),
        },
        "train_psnr_curve": [[e, round(p, 3)] for e, p in psnr_curve],
        "history": curve,
        "renders_npz": os.path.join(wd, "renders.npz"),
        "metrics_jsonl": os.path.join(wd, "logs", "metrics.jsonl"),
        "workdir": wd,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: v for k, v in out.items()
                      if k not in ("history", "train_psnr_curve")}, indent=1))


if __name__ == "__main__":
    main()
