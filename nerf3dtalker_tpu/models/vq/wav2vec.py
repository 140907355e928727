"""wav2vec 2.0 speech encoder (flax) for CodeTalker stage-2.

Re-implements the inference path of the reference's patched HF
`Wav2Vec2Model` (StandardizedSpace/models/lib/wav2vec.py:1-125 wraps
`transformers` wav2vec2 and adds frame-rate resampling): raw waveform ->
conv feature extractor (group-norm first layer, GELU) -> feature
projection (LayerNorm + Dense) -> transformer encoder with a grouped
convolutional relative positional embedding -> [B, S, hidden] states,
then linear-interp resampling to the video frame rate
(`linear_interpolation`, wav2vec.py:61-67 — align_corners=True).

Weights convert 1:1 from a HF torch `Wav2Vec2Model` via
:func:`convert_hf_wav2vec2` (the spec-augment `masked_spec_embed` is
training-only and dropped). Layout is TPU-native channels-last [B, T, C].
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp


def _gelu(x):
    # torch nn.GELU() default: exact erf form
    return nn.gelu(x, approximate=False)


class FeatureEncoder(nn.Module):
    """Conv waveform feature extractor (HF Wav2Vec2FeatureEncoder,
    feat_extract_norm='group': GroupNorm only after conv 0)."""

    conv_dim: Tuple[int, ...]
    conv_kernel: Tuple[int, ...]
    conv_stride: Tuple[int, ...]
    conv_bias: bool = False

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        x = wav[..., None]                                  # [B, N, 1]
        for i, (d, k, s) in enumerate(
            zip(self.conv_dim, self.conv_kernel, self.conv_stride)
        ):
            x = nn.Conv(
                d, (k,), strides=(s,), padding="VALID",
                use_bias=self.conv_bias, name=f"conv{i}",
            )(x)
            if i == 0:
                # GroupNorm(groups == channels): per-channel norm over time
                x = nn.GroupNorm(num_groups=d, name="group_norm")(x)
            x = _gelu(x)
        return x                                            # [B, S, C]


class EncoderLayer(nn.Module):
    """Post-norm transformer layer (HF Wav2Vec2EncoderLayer,
    do_stable_layer_norm=False)."""

    hidden: int
    heads: int
    intermediate: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        B, T, _ = x.shape
        h = self.heads
        hd = self.hidden // h
        q = nn.Dense(self.hidden, name="q_proj")(x) * (hd ** -0.5)
        k = nn.Dense(self.hidden, name="k_proj")(x)
        v = nn.Dense(self.hidden, name="v_proj")(x)

        def split(t):
            return t.reshape(B, T, h, hd).transpose(0, 2, 1, 3)

        att = nn.softmax(
            jnp.einsum("bhid,bhjd->bhij", split(q), split(k)), axis=-1
        )
        out = jnp.einsum("bhij,bhjd->bhid", att, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(B, T, self.hidden)
        x = x + nn.Dense(self.hidden, name="out_proj")(out)
        x = nn.LayerNorm(name="layer_norm")(x)
        y = _gelu(nn.Dense(self.intermediate, name="intermediate_dense")(x))
        x = x + nn.Dense(self.hidden, name="output_dense")(y)
        return nn.LayerNorm(name="final_layer_norm")(x)


class Wav2Vec2Encoder(nn.Module):
    """Full wav2vec2 inference encoder: wav [B, N] -> [B, S, hidden]."""

    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_bias: bool = False
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        x = FeatureEncoder(
            self.conv_dim, self.conv_kernel, self.conv_stride,
            self.conv_bias, name="feature_extractor",
        )(wav)
        x = nn.LayerNorm(name="fp_layer_norm")(x)
        x = nn.Dense(self.hidden_size, name="fp_projection")(x)

        # grouped-conv positional embedding (Wav2Vec2PositionalConvEmbedding)
        k = self.num_conv_pos_embeddings
        pos = nn.Conv(
            self.hidden_size, (k,), padding=[(k // 2, k // 2)],
            feature_group_count=self.num_conv_pos_embedding_groups,
            name="pos_conv",
        )(x)
        if k % 2 == 0:                    # Wav2Vec2SamePadLayer
            pos = pos[:, :-1]
        x = x + _gelu(pos)
        x = nn.LayerNorm(name="enc_layer_norm")(x)
        for i in range(self.num_layers):
            x = EncoderLayer(
                self.hidden_size, self.num_heads, self.intermediate_size,
                name=f"layer{i}",
            )(x)
        return x


def resample_frames_aligned(features: jnp.ndarray, target_len: int) -> jnp.ndarray:
    """Linear resampling with align_corners=True semantics, matching the
    reference's `linear_interpolation` (wav2vec.py:61-67: torch
    F.interpolate(..., align_corners=True, mode='linear'))."""
    B, T, C = features.shape
    if target_len == T:
        return features
    if target_len == 1 or T == 1:
        return jnp.broadcast_to(features[:, :1], (B, target_len, C))
    pos = jnp.linspace(0.0, T - 1.0, target_len)
    lo = jnp.floor(pos).astype(jnp.int32)
    hi = jnp.minimum(lo + 1, T - 1)
    w = (pos - lo.astype(pos.dtype))[None, :, None].astype(features.dtype)
    return features[:, lo] * (1.0 - w) + features[:, hi] * w


def encode_audio(
    params: Dict,
    wav: jnp.ndarray,
    frame_num: int,
    model: Wav2Vec2Encoder = None,
    input_fps: float = 50.0,
    output_fps: float = 30.0,
) -> jnp.ndarray:
    """wav [B, N] -> frame-aligned features [B, frame_num, hidden]
    (the reference's vocaset path: encoder then 50->30 fps linear interp
    to `frame_num`, wav2vec.py:95-100)."""
    model = model or Wav2Vec2Encoder()
    h = model.apply(params, wav)
    if frame_num is None:
        frame_num = int(h.shape[1] / input_fps * output_fps)
    return resample_frames_aligned(h, frame_num)


def _check_hf_arch(c) -> None:
    """This port implements the wav2vec2-BASE topology (group-norm conv0,
    post-norm encoder) — the variant the reference builds on. Refuse the
    'layer'-norm / stable-layer-norm large variants instead of silently
    converting them wrong."""
    if getattr(c, "feat_extract_norm", "group") != "group":
        raise NotImplementedError(
            "flax Wav2Vec2Encoder supports feat_extract_norm='group' "
            f"(base models); got {c.feat_extract_norm!r}"
        )
    if getattr(c, "do_stable_layer_norm", False):
        raise NotImplementedError(
            "flax Wav2Vec2Encoder implements the post-norm (base) layer "
            "ordering; do_stable_layer_norm=True models are unsupported"
        )


def normalize_wav(wav: jnp.ndarray, eps: float = 1e-7) -> jnp.ndarray:
    """Per-utterance zero-mean/unit-variance normalization ([B, N]),
    matching the HF Wav2Vec2 feature extractor's do_normalize=True
    preprocessing that the pretrained base checkpoints expect."""
    mean = jnp.mean(wav, axis=-1, keepdims=True)
    var = jnp.var(wav, axis=-1, keepdims=True)
    return (wav - mean) / jnp.sqrt(var + eps)


def config_from_hf(torch_model) -> Wav2Vec2Encoder:
    """Build a matching flax encoder from a HF torch Wav2Vec2Model."""
    c = torch_model.config
    _check_hf_arch(c)
    return Wav2Vec2Encoder(
        conv_dim=tuple(c.conv_dim),
        conv_kernel=tuple(c.conv_kernel),
        conv_stride=tuple(c.conv_stride),
        conv_bias=bool(c.conv_bias),
        hidden_size=c.hidden_size,
        num_layers=c.num_hidden_layers,
        num_heads=c.num_attention_heads,
        intermediate_size=c.intermediate_size,
        num_conv_pos_embeddings=c.num_conv_pos_embeddings,
        num_conv_pos_embedding_groups=c.num_conv_pos_embedding_groups,
    )


def convert_hf_wav2vec2(torch_model) -> Dict:
    """HF torch `Wav2Vec2Model` -> flax params for Wav2Vec2Encoder.

    Takes the instantiated module (not a state_dict) so the weight-normed
    positional conv resolves to its effective weight.
    """
    import numpy as np

    _check_hf_arch(torch_model.config)

    def t2j(t):
        return jnp.asarray(np.asarray(t.detach().cpu(), dtype=np.float32))

    def dense(lin):
        return {"kernel": t2j(lin.weight).T, "bias": t2j(lin.bias)}

    def ln(mod):
        return {"scale": t2j(mod.weight), "bias": t2j(mod.bias)}

    m = torch_model
    fe = {}
    for i, layer in enumerate(m.feature_extractor.conv_layers):
        conv = {"kernel": t2j(layer.conv.weight).transpose(2, 1, 0)}
        if layer.conv.bias is not None:
            conv["bias"] = t2j(layer.conv.bias)
        fe[f"conv{i}"] = conv
        if i == 0:
            fe["group_norm"] = ln(layer.layer_norm)
    params = {
        "feature_extractor": fe,
        "fp_layer_norm": ln(m.feature_projection.layer_norm),
        "fp_projection": dense(m.feature_projection.projection),
        "pos_conv": {
            # grouped torch conv [out, in/groups, k] -> flax [k, in/g, out];
            # .weight resolves weight_norm to the effective kernel
            "kernel": t2j(m.encoder.pos_conv_embed.conv.weight).transpose(2, 1, 0),
            "bias": t2j(m.encoder.pos_conv_embed.conv.bias),
        },
        "enc_layer_norm": ln(m.encoder.layer_norm),
    }
    for i, layer in enumerate(m.encoder.layers):
        params[f"layer{i}"] = {
            "q_proj": dense(layer.attention.q_proj),
            "k_proj": dense(layer.attention.k_proj),
            "v_proj": dense(layer.attention.v_proj),
            "out_proj": dense(layer.attention.out_proj),
            "layer_norm": ln(layer.layer_norm),
            "intermediate_dense": dense(layer.feed_forward.intermediate_dense),
            "output_dense": dense(layer.feed_forward.output_dense),
            "final_layer_norm": ln(layer.final_layer_norm),
        }
    return {"params": params}
