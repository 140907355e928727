"""Audio-to-expression regressor training.

Equivalent of reference `train_au_exp.py:224-590`: trains the SadTalker
`SimpleWrapperV2` netG so its per-frame 64-d expression prediction from
(mel chunk, frame-0 exp, blink ratio) matches the fitted 3DMM expression,
via L1 (`exploss = L1(base_expr_i_64, auds_exp)`, :573) with Adam at the
reference's tiny lr (1e-7, :576-580).

The 64-of-79 expression-dim selection (`bian`, train_au_exp.py:529) is the
fixed index map between the nl3dmm 79-d expression space and SadTalker's
64-d space.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from nerf3dtalker_tpu.models.audio import SimpleWrapperV2

# train_au_exp.py:529 — nl3dmm expr dims used as SadTalker's 64-d exp
BIAN = np.array(
    [0, 1, 2, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15, 16, 17, 18, 19, 20, 21,
     22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36, 37, 38,
     39, 40, 41, 42, 43, 44, 45, 46, 47, 48, 49, 50, 51, 52, 53, 54, 55,
     56, 57, 59, 61, 63, 64, 66, 68, 69, 73, 77], np.int32,
)


def select_expr64(expr79: jnp.ndarray) -> jnp.ndarray:
    """[.., 79] -> [.., 64] via the bian index map."""
    return jnp.take(expr79, jnp.asarray(BIAN), axis=-1)


class A2ETrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def build_audio2exp_step(lr: float = 1e-7):
    """Returns (init, train_step). Batch:
      mels     [B, T, 80, 16]  per-frame mel chunks
      expr79   [B, T, 79]      fitted 3DMM expressions (targets)
      expr79_0 [B, 79]         frame-0 expression (the ref input)
      ratios   [B, T]          blink ratios
    """
    netG = SimpleWrapperV2()
    optimizer = optax.adam(lr)

    def forward(params, batch):
        B, T = batch["mels"].shape[:2]
        ref = select_expr64(batch["expr79_0"])          # [B, 64]
        mels = batch["mels"].reshape(B * T, 80, 16, 1)
        refs = jnp.repeat(ref, T, axis=0)
        ratios = batch["ratios"].reshape(B * T, 1)
        pred = netG.apply(params, mels, refs, ratios)    # [B*T, 64]
        return pred.reshape(B, T, 64)

    def loss_fn(params, batch):
        pred = forward(params, batch)
        target = select_expr64(batch["expr79"])          # [B, T, 64]
        return jnp.mean(jnp.abs(pred - target))

    def init(rng, batch):
        B, T = batch["mels"].shape[:2]
        params = netG.init(
            rng, jnp.zeros((1, 80, 16, 1)), jnp.zeros((1, 64)), jnp.zeros((1, 1))
        )
        return A2ETrainState(params, optimizer.init(params), jnp.zeros((), jnp.int32))

    @jax.jit
    def train_step(state: A2ETrainState, batch):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch)
        updates, opt = optimizer.update(grads, state.opt_state, state.params)
        return (
            A2ETrainState(optax.apply_updates(state.params, updates), opt,
                          state.step + 1),
            {"exp_loss": loss},
        )

    return init, train_step, jax.jit(forward)
