"""CodeTalker stage-2 trainer (train_pred equivalent).

Equivalent of reference `StandardizedSpace/main/train_pred.py:1-246`: the
autoregressive speech->motion predictor is trained with teacher forcing
against the frozen stage-1 codebook — motion MSE through the frozen
decoder + code-regression MSE (stage2.py:93-100) — AdamW + StepLR, the
stage-1 autoencoder's params frozen.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from nerf3dtalker_tpu.config import VQConfig
from nerf3dtalker_tpu.models.vq.stage2 import CodeTalker, stage2_loss


class Stage2TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def build_stage2_step(
    cfg: VQConfig,
    vq_apply,              # frozen stage-1: quantize + decode callables
    vertice_dim: int,
    lr: float = 1e-4,
    weight_decay: float = 2e-3,
    feature_dim: int = 64,
    n_subjects: int = 8,
):
    """vq_apply must provide:
       quantize(codes [B, L, e]) -> (quantized, indices)
       get_gt_quant(motion [B, T, V3]) -> [B, L, e]
       decode(quantized) -> motion [B, T, V3]
    Batch: audio_feats [B, S, 768]; motion [B, T, V3]; onehot [B, n_subj].
    """
    model = CodeTalker(
        cfg, feature_dim=feature_dim, n_subjects=n_subjects,
        vertice_dim=vertice_dim,
    )
    optimizer = optax.adamw(lr, weight_decay=weight_decay)

    def loss_fn(params, batch):
        pred_codes = model.apply(
            params, batch["audio_feats"], batch["motion"], batch["onehot"]
        )
        gt_quant = vq_apply["get_gt_quant"](batch["motion"])
        quantized, _ = vq_apply["quantize"](pred_codes)
        recon = vq_apply["decode"](quantized)
        total, (lm, lr_) = stage2_loss(pred_codes, gt_quant, recon, batch["motion"])
        return total, {"loss_motion": lm, "loss_reg": lr_, "total_loss": total}

    def init(rng, batch):
        params = model.init(
            rng, batch["audio_feats"], batch["motion"], batch["onehot"]
        )
        return Stage2TrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))

    @jax.jit
    def train_step(state: Stage2TrainState, batch):
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params, batch
        )
        updates, opt = optimizer.update(grads, state.opt_state, state.params)
        return (
            Stage2TrainState(
                optax.apply_updates(state.params, updates), opt, state.step + 1
            ),
            metrics,
        )

    def predict(params, audio_feats, onehot, T: int,
                onehot2=None, style_weight=None):
        """Autoregressive inference (reference stage2.py:102-155), with
        optional two-subject style interpolation (:108-114).

        The reference re-decodes the growing motion prefix each frame; the
        TPU-native form keeps shapes static: a fori_loop over frames runs
        the teacher-forced forward on a zero-padded motion buffer — the
        causal mask plus the one-frame input shift make row t depend only
        on frames < t, so writing frame t back into the buffer reproduces
        the autoregressive recurrence exactly.
        """
        B = audio_feats.shape[0]
        Q = cfg.face_quan_num

        def body(t, buf):
            codes = model.apply(
                params, audio_feats, buf, onehot,
                subject_onehot2=onehot2, style_weight=style_weight,
            )
            quantized, _ = vq_apply["quantize"](codes)
            recon = vq_apply["decode"](quantized)      # [B, T, V3]
            frame = jax.lax.dynamic_slice_in_dim(recon, t, 1, axis=1)
            return jax.lax.dynamic_update_slice_in_dim(buf, frame, t, axis=1)

        buf = jnp.zeros((B, T, vertice_dim), audio_feats.dtype)
        return jax.lax.fori_loop(0, T, body, buf)

    return init, train_step, predict
