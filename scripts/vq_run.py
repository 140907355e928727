"""Standardized Space ON THE CHIP (VERDICT r4 next-round #2).

Two phases, one artifact:

  1. **bench** — the VQ stage-1 train step (5 AU classifiers + dual-
     codebook autoencoder + AdamW) and `reconstruct_split`-style inference
     at the reference scale (img 256, VQConfig defaults), timed on the
     real TPU with the in-scan chained recipe bench.py uses.
     Reference analog: StandardizedSpace/main/train_vq.py:239-375.
  2. **refine** — stage-1 training on REAL NeRF renders from the r5
     convergence run (scripts/train_r05.py --> renders.npz): gen = the
     trained HeadNeRF's renders, gt = ground truth. After training, the
     refined frames (gen+, background reset through the mask like
     test_vq.py:137) must beat the raw renders on PSNR/L1 — the
     reference's whole stage-2 quality claim (test_vq.py:52-150).

    python scripts/vq_run.py --renders <workdir>/renders.npz \
        --out BENCH_VQ_r05.json [--steps 600]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AU_IDS = (10, 14, 20, 25, 26)


def downsample2x(x):
    """[N, 2H, 2W, C] -> [N, H, W, C] area average."""
    n, h, w, c = x.shape
    return x.reshape(n, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


def build_vq_data(renders, split, size=256):
    """VQ training batch arrays from the r5 renders: images downsampled
    2x toward the reference's 256, mouth/brow crops (112^2) for the 5 AU
    classifiers, AU labels derived from the subject's openness/brow
    signals (AU25/26 <- mouth open, AU10/14/20 <- brow/mouth)."""
    import jax

    gen = downsample2x(renders[f"{split}_render"]).astype(np.float32)
    gt = downsample2x(renders[f"{split}_gt"]).astype(np.float32)
    mask = (downsample2x(renders[f"{split}_mask"]) >= 0.5).astype(np.float32)
    a = renders[f"a_{split}"]
    b = renders[f"b_{split}"]
    S = gen.shape[1]
    n = len(gen)

    def crop(img, cy_frac):
        # feature-centred square crop (~0.44*S), resized to the AU
        # classifiers' 112^2 input
        cs = max(8, int(0.44 * S))
        cy, cx = int(cy_frac * S), S // 2
        y0 = max(0, min(S - cs, cy - cs // 2))
        x0 = max(0, min(S - cs, cx - cs // 2))
        c = img[:, y0 : y0 + cs, x0 : x0 + cs, :]
        if cs != 112:
            c = np.asarray(jax.image.resize(c, (n, 112, 112, 3), "linear"))
        return c

    mouth = crop(gen, 0.70)
    brow = crop(gen, 0.34)
    crops = np.stack([brow, brow, mouth, mouth, mouth], axis=1)
    labels = np.stack([
        (b > 0.0), (b < -0.3), (a > 0.5), (a > 0.33), (a > 0.66),
    ], axis=1).astype(np.float32)
    return {
        "gen_img": gen, "gt_img": gt, "mask": mask,
        "crops": crops.astype(np.float32), "au_labels": labels,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--renders", required=True)
    ap.add_argument("--out", default="BENCH_VQ_r05.json")
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--batch-size", type=int, default=4)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--bench-iters", type=int, default=100,
                    help="also the refine chunk length, so bench and "
                         "refine share one compiled scan program")
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (smoke mode; leave the chip alone)")
    args = ap.parse_args()

    from nerf3dtalker_tpu.utils.timing import enable_compile_cache

    enable_compile_cache()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from nerf3dtalker_tpu.config import VQConfig
    from nerf3dtalker_tpu.train.vq_trainer import build_vq_step

    renders = np.load(args.renders)
    train = build_vq_data(renders, "train")
    val = build_vq_data(renders, "val")
    # reference stage-1 scale is 256px (hidden 512); img_size follows the
    # renders (512-px r5 renders downsample to exactly 256)
    cfg = VQConfig(img_size=int(train["gen_img"].shape[1]))
    n_train = len(train["gen_img"])

    init, train_step, eval_step = build_vq_step(cfg, lr=args.lr)
    b0 = {k: jnp.asarray(v[: args.batch_size]) for k, v in train.items()}
    state = init(jax.random.key(0), b0)

    # ---- phase 1: on-chip step bench (content-only, in-scan) -------------
    dev = {k: jnp.asarray(v) for k, v in train.items()}

    def gather(idx):
        return {k: jnp.take(v, idx, 0) for k, v in dev.items()}

    def many(state, order):
        def body(st, idx):
            st, m = train_step(st, gather(idx))
            return st, m["total_loss"]
        return jax.lax.scan(body, state, order)

    jmany = jax.jit(many)
    B = args.batch_size
    rng = np.random.default_rng(0)

    def orders(n_steps, seed=0):
        r = np.random.default_rng(seed)
        o = np.stack([
            r.choice(n_train, B, replace=False) for _ in range(n_steps)
        ]).astype(np.int32)
        return jnp.asarray(o)

    t0 = time.time()
    # warm with the SAME scan length as the measurement — scan length is
    # part of the compiled shape, so a different warm length would leave
    # the measured call paying a fresh compile
    st_w, _ = jmany(state, orders(args.bench_iters))
    jax.block_until_ready(st_w.step)
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    st_w, tl = jmany(state, orders(args.bench_iters, seed=1))
    jax.block_until_ready(tl)
    ms_step = (time.perf_counter() - t0) / args.bench_iters * 1e3

    # inference throughput: the reconstruct_split recon_batch content
    from nerf3dtalker_tpu.models.vq import AUClassifier, VQAutoEncoder

    vq, au = VQAutoEncoder(cfg), AUClassifier()

    @jax.jit
    def recon_batch(vq_params, au_params, gen_img, crops, mask):
        def one(p, c):
            return au.apply(p, c, deterministic=True)
        feats, _ = jax.vmap(one, in_axes=(0, 1), out_axes=(1, 1))(
            au_params, crops
        )
        out = vq.apply(vq_params, gen_img, feats)
        return jnp.where(mask >= 0.5, out.recon, 1.0)

    rb = lambda st, sl: recon_batch(
        st.vq_params, st.au_params, dev["gen_img"][sl], dev["crops"][sl],
        dev["mask"][sl],
    )
    r = rb(state, slice(0, B))
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    iters = 20
    for i in range(iters):
        r = rb(state, slice(0, B))
    jax.block_until_ready(r)
    ms_frame_infer = (time.perf_counter() - t0) / (iters * B) * 1e3

    bench = {
        "img_size": cfg.img_size,
        "batch_size": B,
        "train_ms_per_step": round(ms_step, 2),
        "train_steps_per_s": round(1e3 / ms_step, 2),
        "infer_ms_per_frame": round(ms_frame_infer, 3),
        "compile_s": round(compile_s, 1),
        "workload": "stage-1 VQ autoencoder + 5 AU classifiers + AdamW, "
                    "device-resident data, lax.scan over steps",
    }
    print("bench:", json.dumps(bench), flush=True)

    # ---- phase 2: refinement on real NeRF renders ------------------------
    def split_metrics(st, data):
        outs = []
        n = len(data["gen_img"])
        for s in range(0, n, B):
            sl = slice(s, min(s + B, n))
            outs.append(np.asarray(recon_batch(
                st.vq_params, st.au_params,
                jnp.asarray(data["gen_img"][sl]),
                jnp.asarray(data["crops"][sl]),
                jnp.asarray(data["mask"][sl]),
            )))
        rec = np.concatenate(outs, 0)
        def pnsr_l1(x):
            mse = np.mean((x - data["gt_img"]) ** 2)
            return (float(10 * np.log10(1.0 / max(mse, 1e-10))),
                    float(np.mean(np.abs(x - data["gt_img"]))))
        gen_psnr, gen_l1 = pnsr_l1(data["gen_img"])
        rec_psnr, rec_l1 = pnsr_l1(rec)
        return {
            "gen_psnr": round(gen_psnr, 3), "genplus_psnr": round(rec_psnr, 3),
            "gen_l1": round(gen_l1, 5), "genplus_l1": round(rec_l1, 5),
            "refined_beats_raw": bool(rec_psnr > gen_psnr),
        }

    def train_refiner(dev_data, tag):
        d = {k: jnp.asarray(v) for k, v in dev_data.items()}

        def gather_d(idx):
            return {k: jnp.take(v, idx, 0) for k, v in d.items()}

        def many_d(state, order):
            def body(st, idx):
                st, m = train_step(st, gather_d(idx))
                return st, m["total_loss"]
            return jax.lax.scan(body, state, order)

        jm = jax.jit(many_d)
        st = init(jax.random.key(0), {k: v[:B] for k, v in d.items()})
        steps_done = 0
        t0 = time.time()
        while steps_done < args.steps:
            chunk = min(args.bench_iters, args.steps - steps_done)
            st, tl = jm(st, orders(chunk, seed=100 + steps_done))
            steps_done += chunk
            print(f"[{tag}] refine step {steps_done}: loss "
                  f"{float(np.asarray(tl)[-1]):.4f}", flush=True)
        jax.block_until_ready(st.step)
        return st, steps_done, time.time() - t0

    # A) the reference regime: gen frames limited by conditioning
    #    mismatch (REAL renders with audio_exp zeroed) -> VQ repairs them.
    #    Train on the train split, evaluate held-out on the val split.
    refine = {"source": "real HeadNeRF renders from scripts/train_r05.py "
                        "(renders.npz), downsampled toward the "
                        "reference's 256px"}
    if "train_degraded" in renders.files:
        # rebuild crops from the DEGRADED gen (the AU classifiers see gen
        # frames at refinement time, test_vq.py:107-123)
        def deg_src(split):
            return {
                f"{split}_render": renders[f"{split}_degraded"],
                f"{split}_gt": renders[f"{split}_gt"],
                f"{split}_mask": renders[f"{split}_mask"],
                f"a_{split}": renders[f"a_{split}"],
                f"b_{split}": renders[f"b_{split}"],
            }

        tr_deg = build_vq_data(deg_src("train"), "train")
        st_a, n_a, s_a = train_refiner(tr_deg, "degraded")
        rows = {"train": split_metrics(st_a, tr_deg)}
        if "val_degraded" in renders.files:
            va_deg = build_vq_data(deg_src("val"), "val")
            rows["val_heldout"] = split_metrics(st_a, va_deg)
        refine["degraded_conditioning"] = {
            "note": "the reference's refinement regime (test_vq.py): gen "
                    "frames whose quality is limited by conditioning "
                    "mismatch; stage-1 must pull them toward GT",
            "steps": n_a, "refine_s": round(s_a, 1), **rows,
        }
        print("refine A:", json.dumps(refine["degraded_conditioning"]),
              flush=True)

    # B) the overfit-quality renders (~29.5 dB): an honest capacity probe —
    #    refinement cannot beat raw once raw exceeds the autoencoder's own
    #    reconstruction ceiling, which we also measure (GT->GT passthrough)
    st_b, n_b, s_b = train_refiner(train, "hq")
    hq = {
        "steps": n_b, "refine_s": round(s_b, 1),
        "train": split_metrics(st_b, train),
        "val": split_metrics(st_b, val),
    }
    gt_as_gen = dict(train, gen_img=train["gt_img"])
    hq["gt_passthrough"] = split_metrics(st_b, gt_as_gen)
    hq["note"] = (
        "gt_passthrough.genplus_psnr is the trained autoencoder's own "
        "reconstruction ceiling; raw renders above it cannot be improved "
        "by this stage (the reference never operates in that regime - "
        "its gen frames sit well below the ceiling)"
    )
    refine["high_quality_renders"] = hq
    print("refine B:", json.dumps(hq), flush=True)

    out = {
        "metric": "vq_standardized_space_tpu",
        "platform": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "reference": "StandardizedSpace/main/train_vq.py:239-375 (train), "
                     "test_vq.py:52-150 (gen+ refinement)",
        "bench": bench,
        "refinement": refine,
    }
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
