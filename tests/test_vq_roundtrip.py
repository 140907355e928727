"""Standardized-Space round-trip integration (VERDICT r3 next-round #6).

Proves the refinement stage *refines*, not just runs: synthetic frames ->
brief stage-1 training -> `reconstruct_split` must produce frames closer
to GT than the noisy NeRF renders it was given
(L1(recon, gt) < L1(gen, gt)), then the stage-2 chain — frame_vq_apply
over the SAME trained stage-1 codebook -> CodeTalker teacher-forced
training -> autoregressive `predict` -> `eval_stage2` LVE/FDD — runs as
one driver.

Reference: StandardizedSpace/main/test_vq.py:52-150 (gen+/ refinement),
main/train_pred.py + cal_metric.py:7-80 (stage-2 + vertex metrics).
CLI equivalents: `eval-vq` (stage 1) and `infer-stage2` (stage 2).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

from nerf3dtalker_tpu.config import VQConfig
from nerf3dtalker_tpu.train.vq_eval import (
    eval_stage2,
    frame_vq_apply,
    reconstruct_split,
)
from nerf3dtalker_tpu.train.vq_trainer import build_vq_step

TINY = VQConfig(
    hidden_size=32, embed_dim=8, n_embed=64, n_embed_au=8,
    num_hidden_layers=1, num_attention_heads=2, intermediate_size=64,
    img_size=16, au_dim=256, n_au=5,
)


def _split(N=4, seed=0, noise=0.3):
    """GT = smooth low-frequency images; gen = GT + uniform noise (the
    'NeRF render' the Standardized Space is supposed to clean up).

    Crops are 48x48 — the smallest size the AUClassifier conv stack
    supports (it is size-generic up to its flatten; full-size 112 crops
    only scale CPU cost, not coverage)."""
    rng = np.random.default_rng(seed)
    f32 = np.float32
    yy, xx = np.mgrid[0:16, 0:16] / 16.0
    gt = np.stack(
        [
            0.5 + 0.4 * np.sin(2 * np.pi * (a * xx + b * yy + c))
            for a, b, c in rng.uniform(0.3, 1.5, (N, 3))
        ]
    )[..., None].repeat(3, axis=-1).astype(f32)
    gen = np.clip(
        gt + rng.uniform(-noise, noise, gt.shape).astype(f32), 0, 1
    )
    return {
        "gen_img": gen,
        "gt_img": gt,
        "mask": np.ones((N, 16, 16, 1), f32),
        "crops": rng.uniform(0, 1, (N, 5, 48, 48, 3)).astype(f32),
        "au_labels": (rng.uniform(0, 1, (N, 5)) > 0.5).astype(f32),
    }


def test_stage1_refines_and_stage2_chains(tmp_path):
    data = _split()
    batch = {k: jnp.asarray(v) for k, v in data.items()}
    init, train_step, _ = build_vq_step(TINY, lr=2e-3, au_loss_weight=0.1)
    state = init(jax.random.key(0), batch)
    for _ in range(200):
        state, m = train_step(state, batch)
    assert np.isfinite(float(m["total_loss"]))

    # ---- stage 1: the refinement must actually refine -------------------
    out_dir = str(tmp_path / "gen_plus")
    metrics = reconstruct_split(
        TINY, state.vq_params, state.au_params, data, out_dir=out_dir
    )
    l1_gen = float(np.mean(np.abs(data["gen_img"] - data["gt_img"])))
    assert metrics["rec_l1"] < l1_gen, (
        f"refinement did not refine: L1(recon,gt)={metrics['rec_l1']:.4f} "
        f">= L1(gen,gt)={l1_gen:.4f}"
    )
    pngs = [f for f in os.listdir(out_dir) if f.endswith(".png")]
    assert len(pngs) == len(data["gen_img"])

    # ---- stage 2 over the SAME trained codebook -------------------------
    from nerf3dtalker_tpu.train.stage2_trainer import build_stage2_step

    import dataclasses

    vq_apply = frame_vq_apply(TINY, state.vq_params)
    # CodeTalker must emit exactly the stage-1 encoder's codes/frame
    # (the infer-stage2 CLI does the same face_quan_num rebind)
    s2_cfg = dataclasses.replace(
        TINY, face_quan_num=vq_apply["codes_per_frame"]
    )
    V3 = vq_apply["vertice_dim"]
    T, B, S = 3, 1, 6
    rng = np.random.default_rng(1)
    motion = data["gt_img"][:T].reshape(1, T, V3)
    s2batch = {
        "audio_feats": jnp.asarray(
            rng.standard_normal((B, S, 768)).astype(np.float32) * 0.1
        ),
        "motion": jnp.asarray(motion),
        "onehot": jnp.asarray(np.eye(4, dtype=np.float32)[[0]]),
    }
    s2init, s2train, s2pred = build_stage2_step(
        s2_cfg, vq_apply, vertice_dim=V3, feature_dim=16, n_subjects=4,
    )
    s2state = s2init(jax.random.key(1), s2batch)
    _, m0 = s2train(s2state, s2batch)
    for _ in range(10):
        s2state, m2 = s2train(s2state, s2batch)
    assert float(m2["total_loss"]) < float(m0["total_loss"])

    # ---- chained eval driver: predict -> LVE / FDD ----------------------
    verts_gt = motion[0].reshape(T, -1, 3)
    template = verts_gt[0]
    res = eval_stage2(
        s2pred, s2state.params,
        np.asarray(s2batch["audio_feats"]), np.asarray(s2batch["onehot"]),
        num_frames=T,
        verts_gt=verts_gt, template=template,
        mouth_map=list(range(0, 40)), upper_map=list(range(40, 80)),
        out_path=str(tmp_path / "pred.npy"),
    )
    assert np.isfinite(res["LVE"]) and np.isfinite(res["FDD"])
    assert (tmp_path / "pred.npy").exists()
