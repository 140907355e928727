"""Standardized-Space evaluation drivers.

Equivalents of the reference's dedicated eval scripts:

  * :func:`reconstruct_split` — `StandardizedSpace/main/test_vq.py:52-150`:
    run the 5 AU classifiers on each test frame's crops, reconstruct the
    frame through the stage-1 VQ autoencoder, reset background pixels to
    white via the mask (test_vq.py:137), and write viewable `gen+/` PNGs;
    returns per-split image metrics.
  * :func:`eval_stage2` — `main/test_pred.py` + `cal_metric.py:7-80`:
    autoregressively predict motion from wav2vec2 audio features with
    CodeTalker and score LVE / FDD against ground-truth vertex sequences.
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from nerf3dtalker_tpu.config import VQConfig
from nerf3dtalker_tpu.models.vq.au_classifier import AUClassifier
from nerf3dtalker_tpu.models.vq.stage1 import VQAutoEncoder
from nerf3dtalker_tpu.utils.mesh_metrics import fdd, lip_vertex_error


from nerf3dtalker_tpu.utils.video import write_png as _write_png


def reconstruct_split(
    cfg: VQConfig,
    vq_params,
    au_params,
    data: Dict[str, np.ndarray],
    out_dir: Optional[str] = None,
    batch_size: int = 8,
) -> Dict[str, float]:
    """Reconstruct every frame of a split (test_vq.py test()).

    data: gen_img [N,H,W,3], mask [N,H,W,1], crops [N,n_au,112,112,3]
    (+ optional gt_img for metrics). Writes `{idx}.png` into out_dir —
    the reference's `/gen+/` directory of refined frames.
    """
    vq = VQAutoEncoder(cfg)
    au = AUClassifier()

    # params enter as jit ARGUMENTS, not closure constants: baked-in
    # constants bloat the serialized program by the full parameter bytes
    # (remote-compile transports reject it past ~MBs) and defeat
    # program-cache reuse across checkpoints
    @jax.jit
    def recon_batch(vq_p, au_p, gen_img, crops, mask):
        def one(p, crop):
            return au.apply(p, crop, deterministic=True)

        feats, _ = jax.vmap(one, in_axes=(0, 1), out_axes=(1, 1))(
            au_p, crops
        )
        out = vq.apply(vq_p, gen_img, feats)
        # background reset to white through the head mask (test_vq.py:137)
        return jnp.where(mask >= 0.5, out.recon, 1.0)

    if out_dir:
        os.makedirs(out_dir, exist_ok=True)
    n = len(data["gen_img"])
    l1s, psnrs = [], []
    for s in range(0, n, batch_size):
        sl = slice(s, min(s + batch_size, n))
        rec = np.asarray(
            recon_batch(
                vq_params, au_params,
                jnp.asarray(data["gen_img"][sl]),
                jnp.asarray(data["crops"][sl]),
                jnp.asarray(data["mask"][sl]),
            )
        )
        for j, img in enumerate(rec):
            idx = s + j
            if out_dir:
                _write_png(os.path.join(out_dir, f"{idx}.png"), img)
            if "gt_img" in data:
                gt = data["gt_img"][idx]
                l1s.append(float(np.mean(np.abs(img - gt))))
                mse = float(np.mean((img - gt) ** 2))
                psnrs.append(10.0 * np.log10(1.0 / max(mse, 1e-10)))
    out = {"num_frames": float(n)}
    if l1s:
        out["rec_l1"] = float(np.mean(l1s))
        out["rec_psnr"] = float(np.mean(psnrs))
    return out


def frame_vq_apply(cfg: VQConfig, vq_params) -> Dict:
    """Adapt the (frozen) image VQAutoEncoder into the stage-2 `vq_apply`
    interface over frame sequences.

    The reference's CodeTalker composes with the SAME stage-1 autoencoder
    (stage2.py:43-46 loads stage1_vocaset and calls
    get_quant/quantize/decode on it); here each "motion" frame is one
    image flattened to V3 = H*W*3, encoded to L codes/frame. Deviation:
    the decode path uses neutral (zero) AU-codebook context — the
    reference's predict() feeds only the face codes to decode()
    (stage2.py:141-152).

    NOTE: the returned closures capture the FROZEN stage-1 vq_params; a
    caller that jits them bakes those weights into the program as
    constants. Fine for the CPU-side stage-2 training they serve (XLA
    constant-folds frozen weights), but do not ship them over a
    remote-compile transport at large img_size — pass params as jit
    arguments instead (see reconstruct_split above).
    """
    from nerf3dtalker_tpu.models.vq.quantizer import VectorQuantizer

    vq = VQAutoEncoder(cfg)
    H = W = cfg.img_size
    V3 = H * W * 3
    quantizer = VectorQuantizer(cfg.n_embed, cfg.embed_dim, cfg.beta)
    q_params = {"params": vq_params["params"]["quantize"]}
    # derive L (codes per frame) from the encoder's actual output shape
    # (shape-only trace; a closed-form guess breaks when the conv stack's
    # downsampling changes with img_size/hidden_size)
    q_shape = jax.eval_shape(
        lambda img: vq.apply(vq_params, img, method=VQAutoEncoder.encode)
        .quantized,
        jax.ShapeDtypeStruct((1, H, W, 3), jnp.float32),
    )
    codes_per_frame = int(np.prod(q_shape.shape)) // cfg.embed_dim

    def get_gt_quant(motion):            # [B, T, V3] -> [B, T*L, e]
        B, T, _ = motion.shape
        imgs = motion.reshape(B * T, H, W, 3)
        q = vq.apply(vq_params, imgs, method=VQAutoEncoder.encode)
        return q.quantized.reshape(B, -1, cfg.embed_dim)

    def quantize(codes):                 # [B, L, e] -> nearest codebook
        out = quantizer.apply(q_params, codes)
        return out.quantized, out.indices

    def decode(quant):                   # [B, T*L, e] -> [B, T, V3]
        B = quant.shape[0]
        per = quant.reshape(B, -1, codes_per_frame, cfg.embed_dim)
        T = per.shape[1]
        qi = per.reshape(B * T, codes_per_frame, cfg.embed_dim)
        qa = jnp.zeros((B * T, cfg.n_au, cfg.embed_dim), quant.dtype)
        imgs = vq.apply(vq_params, qi, qa, method=VQAutoEncoder.decode)
        return imgs.reshape(B, T, V3)

    return {
        "get_gt_quant": get_gt_quant,
        "quantize": quantize,
        "decode": decode,
        "codes_per_frame": codes_per_frame,
        "vertice_dim": V3,
    }


def eval_stage2(
    predict_fn,
    params,
    audio_feats: np.ndarray,        # [B, S, 768]
    onehot: np.ndarray,             # [B, n_subjects]
    num_frames: int,
    verts_gt: Optional[np.ndarray] = None,      # [T, V, 3]
    template: Optional[np.ndarray] = None,      # [V, 3]
    mouth_map: Optional[Sequence[int]] = None,
    upper_map: Optional[Sequence[int]] = None,
    out_path: Optional[str] = None,
) -> Dict[str, float]:
    """test_pred-style driver: autoregressive prediction + LVE/FDD.

    `predict_fn` is build_stage2_step(...)'s predict. Saves the predicted
    motion to `out_path` (.npy) like test_pred's save_folder/npy dumps.
    """
    pred = np.asarray(
        predict_fn(params, jnp.asarray(audio_feats), jnp.asarray(onehot),
                   num_frames)
    )
    if out_path:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        np.save(out_path, pred)
    metrics: Dict[str, float] = {"num_frames": float(num_frames)}
    if verts_gt is not None:
        vp = pred[0].reshape(num_frames, -1, 3)
        mouth = mouth_map if mouth_map is not None else range(vp.shape[1])
        metrics["LVE"] = lip_vertex_error(verts_gt, vp, list(mouth))
        if template is not None:
            upper = upper_map if upper_map is not None else range(vp.shape[1])
            metrics["FDD"] = fdd(verts_gt, vp, template, list(upper))
    return metrics
