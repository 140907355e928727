"""Audio pathway models.

TPU-native equivalents of the reference audio encoders:

  * :class:`BiLSTM` / :class:`Audio2Style` — the mel-chunk -> 64-d style
    encoder (reference `RNNModel`/`Audio2style`, talker_trainer.py:408-473):
    per-frame 80x16 mel chunks are flattened, the whole frame *sequence* is
    run through a 2-layer bidirectional LSTM, then three
    Linear+LeakyReLU+Dropout heads squeeze to 64. The LSTM is a
    `flax.linen.scan` over time — compiled once, no per-step Python.
  * :class:`FusAudio2Style` — style-fusion disentanglement head
    (talker_trainer_disexp.py:471-501): cat(style64, sadtalker-exp64) -> 64.
  * :class:`SimpleWrapperV2` — SadTalker audio2exp netG
    (s_audio2exp_models/networks.py:26-74): wav2lip-style conv encoder over
    the mel chunk + Linear(512+64+1 -> 64) on [audio, ref-exp, blink ratio].
  * :func:`audio2exp_sequence` — the per-frame driver loop
    (s_audio2exp_models/audio2exp.py:13-41) as a vmap over frames.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class _GateParams(nn.Module):
    """Declares one gate projection with OptimizedLSTMCell's exact param
    names/shapes/initializers, so the fused BiLSTM below stays checkpoint-
    and converter-compatible with the per-cell layout."""

    shape: Tuple[int, int]
    use_bias: bool
    recurrent: bool

    @nn.compact
    def __call__(self):
        init = (
            nn.initializers.orthogonal()
            if self.recurrent else nn.linear.default_kernel_init
        )
        k = self.param("kernel", init, self.shape)
        b = (
            self.param("bias", nn.initializers.zeros_init(),
                       (self.shape[1],))
            if self.use_bias else None
        )
        return k, b


class _CellParams(nn.Module):
    """The 8 projections of one LSTM cell (flax OptimizedLSTMCell tree:
    i{i,f,g,o} without bias, h{i,f,g,o} with bias), returned stacked as
    Wi [D, 4h], Wh [h, 4h], b [4h] in flax's (i, f, g, o) gate order."""

    in_features: int
    hidden: int

    @nn.compact
    def __call__(self):
        D, h = self.in_features, self.hidden
        wi, wh, bs = [], [], []
        for g in ("i", "f", "g", "o"):
            k, _ = _GateParams((D, h), False, False, name=f"i{g}")()
            wi.append(k)
            kh, bh = _GateParams((h, h), True, True, name=f"h{g}")()
            wh.append(kh)
            bs.append(bh)
        return (
            jnp.concatenate(wi, axis=1),
            jnp.concatenate(wh, axis=1),
            jnp.concatenate(bs, axis=0),
        )


class BiLSTM(nn.Module):
    """2-layer bidirectional LSTM over [B, T, D] (torch nn.LSTM semantics:
    per-layer forward+backward passes whose concatenated outputs feed the
    next layer).

    MXU-fused evaluation (the r4→r5 trainer-tail optimization): per layer,
    ALL timestep input projections run as ONE matmul with both directions
    stacked on a leading axis, and the recurrence keeps only the [h→4h]
    hidden matmul sequential — also batched over the two directions. Short
    sequences (the B=2 training step) unroll fully, so the whole recurrence
    is a handful of fused ops instead of 2·layers·T scan iterations of two
    matmuls each. Param tree is identical to the per-cell layout
    (`l{k}_{fwd,bwd}/{i,h}{i,f,g,o}`), so checkpoints and the torch
    converter (utils/convert.py:78-112) are unaffected; `fused=False`
    keeps the original flax-cell path for parity tests.
    """

    hidden_size: int
    num_layers: int = 2
    fused: bool = True
    unroll_below: int = 17   # full Python unroll for T < this

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, _ = x.shape
        h = self.hidden_size

        if not self.fused:
            for layer in range(self.num_layers):
                outs = []
                for direction in ("fwd", "bwd"):
                    cell = nn.OptimizedLSTMCell(h, name=f"l{layer}_{direction}")
                    carry = cell.initialize_carry(
                        jax.random.key(0), (B, x.shape[-1])
                    )
                    seq = x if direction == "fwd" else jnp.flip(x, axis=1)
                    scan = nn.transforms.scan(
                        lambda c, carry, xt: c(carry, xt),
                        variable_broadcast="params",
                        split_rngs={"params": False},
                        in_axes=1,
                        out_axes=1,
                    )
                    _, y = scan(cell, carry, seq)
                    if direction == "bwd":
                        y = jnp.flip(y, axis=1)
                    outs.append(y)
                x = jnp.concatenate(outs, axis=-1)  # [B, T, 2h]
            return x

        for layer in range(self.num_layers):
            D = x.shape[-1]
            stacks = [
                _CellParams(D, h, name=f"l{layer}_{d}")()
                for d in ("fwd", "bwd")
            ]
            Wi = jnp.stack([s[0] for s in stacks])       # [2, D, 4h]
            Wh = jnp.stack([s[1] for s in stacks])       # [2, h, 4h]
            b = jnp.stack([s[2] for s in stacks])        # [2, 4h]
            x2 = jnp.stack([x, jnp.flip(x, axis=1)])     # [2, B, T, D]
            # every timestep's input projection in one batched matmul
            xp = jnp.einsum("dbtf,dfg->tdbg", x2, Wi) + b[None, :, None, :]

            def step(carry, zx):
                c, hp = carry
                z = zx + jnp.einsum("dbh,dhg->dbg", hp, Wh)
                zi, zf, zg, zo = jnp.split(z, 4, axis=-1)
                f = nn.sigmoid(zf)
                c = f * c + nn.sigmoid(zi) * jnp.tanh(zg)
                y = nn.sigmoid(zo) * jnp.tanh(c)
                return (c, y), y

            carry = (
                jnp.zeros((2, B, h), x.dtype),
                jnp.zeros((2, B, h), x.dtype),
            )
            if T < self.unroll_below:
                ys = []
                for t in range(T):
                    carry, y = step(carry, xp[t])
                    ys.append(y)
                ys = jnp.stack(ys)                       # [T, 2, B, h]
            else:
                _, ys = jax.lax.scan(step, carry, xp)
            fwd = ys[:, 0].transpose(1, 0, 2)            # [B, T, h]
            bwd = jnp.flip(ys[:, 1].transpose(1, 0, 2), axis=1)
            x = jnp.concatenate([fwd, bwd], axis=-1)     # [B, T, 2h]
        return x


class Audio2Style(nn.Module):
    """Mel chunks [T, 80, 16] (a frame sequence) -> style vectors [T, 64]."""

    dropout_rate: float = 0.5
    fused_rnn: bool = True     # MXU-fused BiLSTM (see BiLSTM docstring)

    @nn.compact
    def __call__(self, mels: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        T = mels.shape[0]
        x = mels.reshape(T, 80 * 16)[None]          # [1, T, 1280]
        x = BiLSTM(40 * 16, fused=self.fused_rnn, name="rnn")(x)[0]
        for i, feats in enumerate((40 * 16, 20 * 16, 64)):
            x = nn.Dense(feats, name=f"linear{i+1}")(x)
            x = nn.leaky_relu(x, 0.2)
            x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        return x                                     # [T, 64]


class FusAudio2Style(nn.Module):
    """cat(audiostyle 64, sadtalker-exp 64) -> fused 64
    (talker_trainer_disexp.py:494-501)."""

    dropout_rate: float = 0.5

    @nn.compact
    def __call__(self, f1, f2, deterministic: bool = True) -> jnp.ndarray:
        x = jnp.concatenate([f1, f2], axis=-1)
        for i, feats in enumerate((64, 64)):
            x = nn.Dense(feats, name=f"linear{i+1}")(x)
            x = nn.leaky_relu(x, 0.2)
            x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        return x


class _ConvBN(nn.Module):
    """Conv + BatchNorm + optional residual + ReLU (networks.py:5-24)."""

    cout: int
    kernel: Tuple[int, int]
    stride: Tuple[int, int]
    padding: int
    residual: bool = False
    use_act: bool = True

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.padding
        y = nn.Conv(
            self.cout, self.kernel, strides=self.stride,
            padding=[(p, p), (p, p)], name="conv",
        )(x)
        y = nn.BatchNorm(use_running_average=not train, name="bn")(y)
        if self.residual:
            y = y + x
        return nn.relu(y) if self.use_act else y


class SimpleWrapperV2(nn.Module):
    """SadTalker audio->exp regressor netG (networks.py:26-74), NHWC."""

    @nn.compact
    def __call__(self, mel, ref, ratio, train: bool = False):
        """mel [B, 80, 16, 1]; ref [B, 64]; ratio [B, 1] -> exp [B, 64]."""
        spec = [
            (32, 3, (1, 1), 1, False), (32, 3, (1, 1), 1, True), (32, 3, (1, 1), 1, True),
            (64, 3, (3, 1), 1, False), (64, 3, (1, 1), 1, True), (64, 3, (1, 1), 1, True),
            (128, 3, (3, 3), 1, False), (128, 3, (1, 1), 1, True), (128, 3, (1, 1), 1, True),
            (256, 3, (3, 2), 1, False), (256, 3, (1, 1), 1, True),
            (512, 3, (1, 1), 0, False), (512, 1, (1, 1), 0, False),
        ]
        x = mel
        for i, (c, k, s, p, res) in enumerate(spec):
            x = _ConvBN(c, (k, k), s, p, residual=res, name=f"enc_{i}")(x, train)
        x = x.reshape(x.shape[0], -1)                       # [B, 512]
        y = jnp.concatenate([x, ref.reshape(x.shape[0], -1),
                             ratio.reshape(x.shape[0], -1)], axis=-1)
        return nn.Dense(64, name="mapping1")(y)


def audio2exp_sequence(apply_fn, variables, indiv_mels, ref_exp, ratios):
    """Per-frame netG over a T-frame sequence (audio2exp.py:21-41) as vmap.

    Args:
      apply_fn: SimpleWrapperV2 apply.
      indiv_mels: [T, 80, 16, 1]; ref_exp: [64] (frame-0 exp); ratios: [T].
    Returns [T, 64].
    """
    def one(mel, ratio):
        return apply_fn(
            variables, mel[None], ref_exp[None], jnp.reshape(ratio, (1, 1))
        )[0]

    return jax.vmap(one)(indiv_mels, ratios)
