"""Standardized-Space (VQ) training driver.

Equivalent of reference `StandardizedSpace/main/train_vq.py:26-426`: per
batch, the 5 AU classifiers produce features + probabilities from face
crops (:268-278), AU dice+BCE losses supervise them (:281-302), the VQ
autoencoder reconstructs the NeRF-generated frame conditioned on the AU
features (:308), and masked L1 recon + quantization losses train the
autoencoder (:310-324, metrics/loss.py:6-11 `calc_vq_loss`).

The reference's DDP scaffold (mp.spawn + NCCL + SyncBN + per-rank batch
division, :41-122) becomes a jit with "data"-axis sharding — gradients
all-reduce over ICI automatically; `reduce_tensor` (baseTrainer.py:62-67)
is just the mean the jit already returns.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from nerf3dtalker_tpu.config import VQConfig
from nerf3dtalker_tpu.models.vq import AUClassifier, VQAutoEncoder
from nerf3dtalker_tpu.models.vq.au_classifier import au_bce_loss, au_dice_loss

AU_IDS = (10, 14, 20, 25, 26)   # train_vq.py AU columns 26/28/31/33/34


class VQTrainState(NamedTuple):
    vq_params: Any
    au_params: Any              # stacked params for the 5 AU classifiers
    opt_state: Any
    step: jnp.ndarray


def calc_vq_loss(recon, gt, quant_loss, mask=None, quant_w: float = 1.0):
    """L1 recon (optionally masked) + quantization loss
    (metrics/loss.py:6-11; masking per train_vq.py:310-324)."""
    diff = jnp.abs(recon - gt)
    if mask is not None:
        rec = jnp.sum(diff * mask) / jnp.maximum(jnp.sum(mask) * gt.shape[-1], 1.0)
    else:
        rec = jnp.mean(diff)
    return rec + quant_w * quant_loss, rec


def build_vq_step(
    cfg: VQConfig,
    lr: float = 1e-4,
    weight_decay: float = 2e-3,
    au_loss_weight: float = 1.0,
    mesh=None,
):
    """Returns (init, train_step, eval_step). Batch:
      gen_img [B, H, W, 3]  (NeRF renders, the /gen/ frames)
      gt_img  [B, H, W, 3]
      mask    [B, H, W, 1]
      crops   [B, n_au, 112, 112, 3] per-AU face crops
      au_labels [B, n_au] binary activations from OpenFace CSVs
    """
    vq = VQAutoEncoder(cfg)
    au = AUClassifier()
    optimizer = optax.adamw(lr, weight_decay=weight_decay)

    def au_forward(au_params, crops, rng=None):
        """vmapped over the n_au classifier copies (5 checkpoints in the
        reference, train_vq.py:127-160)."""
        def one(p, crop):
            return au.apply(p, crop, deterministic=True)

        feats, probs = jax.vmap(one, in_axes=(0, 1), out_axes=(1, 1))(
            au_params, crops
        )
        return feats, probs[..., 0]                 # [B, n_au, 256], [B, n_au]

    def loss_fn(params, batch):
        vq_params, au_params = params
        feats, probs = au_forward(au_params, batch["crops"])
        au_loss = au_bce_loss(probs, batch["au_labels"]) + au_dice_loss(
            probs, batch["au_labels"]
        )
        out = vq.apply(vq_params, batch["gen_img"], feats)
        total, rec = calc_vq_loss(
            out.recon, batch["gt_img"], out.quant_loss, batch.get("mask")
        )
        total = total + au_loss_weight * au_loss
        return total, {
            "rec_loss": rec,
            "quant_loss": out.quant_loss,
            "au_loss": au_loss,
            "perplexity": out.perplexity,
            "total_loss": total,
        }

    def init(rng, batch):
        r1, r2 = jax.random.split(rng)
        vq_params = vq.init(
            r1, batch["gen_img"][:1],
            jnp.zeros((1, cfg.n_au, cfg.au_dim)),
        )
        au_one = au.init(r2, batch["crops"][:1, 0])
        au_params = jax.tree.map(
            lambda x: jnp.stack([x] * cfg.n_au), au_one
        )
        params = (vq_params, au_params)
        return VQTrainState(vq_params, au_params, optimizer.init(params),
                            jnp.zeros((), jnp.int32))

    def train_step(state: VQTrainState, batch):
        params = (state.vq_params, state.au_params)
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, batch
        )
        updates, opt = optimizer.update(grads, state.opt_state, params)
        vq_p, au_p = optax.apply_updates(params, updates)
        return VQTrainState(vq_p, au_p, opt, state.step + 1), metrics

    def eval_step(state: VQTrainState, batch):
        _, metrics = loss_fn((state.vq_params, state.au_params), batch)
        return metrics

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        repl = NamedSharding(mesh, P())
        data = NamedSharding(mesh, P("data"))
        bsh = {k: data for k in ("gen_img", "gt_img", "mask", "crops", "au_labels")}
        return (
            init,
            jax.jit(train_step, in_shardings=(repl, bsh), out_shardings=(repl, repl)),
            jax.jit(eval_step, in_shardings=(repl, bsh)),
        )
    return init, jax.jit(train_step), jax.jit(eval_step)
