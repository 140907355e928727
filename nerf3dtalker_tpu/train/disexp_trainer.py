"""Style-fusion disentanglement training (the disexp variant).

Equivalent of reference `talker_trainer_disexp.py:568-1300` (active path at
:1036-1107): `fus = fus_Audio2style(audiostyle, auds_exp)` trained with
L1 against the SadTalker expression of the ground-truth frame — teaching
the fusion head to disentangle the audio style from the expression space.
Only the fusion head's optimizer steps (:1101-1104).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax

from nerf3dtalker_tpu.models.audio import Audio2Style, FusAudio2Style


class DisexpTrainState(NamedTuple):
    fus_params: Any
    audio_params: Any       # frozen Audio2Style
    opt_state: Any
    step: jnp.ndarray


def build_disexp_step(lr: float = 1e-4):
    """Batch: mels [T, 80, 16]; auds_exp [T, 64] (SadTalker exp of the
    lip-synced frame); sad_exp [T, 64] (exp of the GT frame — the target)."""
    audio = Audio2Style()
    fus = FusAudio2Style()
    optimizer = optax.adam(lr)

    def loss_fn(fus_params, audio_params, batch):
        style = audio.apply(audio_params, batch["mels"])        # [T, 64]
        fused = fus.apply(fus_params, style, batch["auds_exp"])
        return jnp.mean(jnp.abs(fused - batch["sad_exp"]))

    def init(rng, batch):
        r1, r2 = jax.random.split(rng)
        audio_params = audio.init(r1, batch["mels"])
        style = audio.apply(audio_params, batch["mels"])
        fus_params = fus.init(r2, style, batch["auds_exp"])
        return DisexpTrainState(
            fus_params, audio_params, optimizer.init(fus_params),
            jnp.zeros((), jnp.int32),
        )

    @jax.jit
    def train_step(state: DisexpTrainState, batch):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.fus_params, state.audio_params, batch
        )
        updates, opt = optimizer.update(grads, state.opt_state, state.fus_params)
        return (
            DisexpTrainState(
                optax.apply_updates(state.fus_params, updates),
                state.audio_params, opt, state.step + 1,
            ),
            {"exp_loss": loss},
        )

    return init, train_step
