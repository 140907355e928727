"""Flax wav2vec2 encoder: golden parity vs a randomly-initialized HF torch
Wav2Vec2Model (the reference's audio encoder base,
StandardizedSpace/models/lib/wav2vec.py:1-125), plus the align_corners
frame resampling vs torch F.interpolate."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp  # noqa: E402

from nerf3dtalker_tpu.models.vq.wav2vec import (  # noqa: E402
    Wav2Vec2Encoder,
    config_from_hf,
    convert_hf_wav2vec2,
    encode_audio,
    resample_frames_aligned,
)


def _tiny_hf_model(seed=0):
    from transformers import Wav2Vec2Config, Wav2Vec2Model

    torch.manual_seed(seed)
    cfg = Wav2Vec2Config(
        vocab_size=32,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=64,
        conv_dim=(16, 32),
        conv_kernel=(10, 3),
        conv_stride=(5, 2),
        num_feat_extract_layers=2,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=False,
        feat_extract_norm="group",
        layerdrop=0.0,
        hidden_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        apply_spec_augment=False,
    )
    m = Wav2Vec2Model(cfg)
    m.eval()
    return m


def test_encoder_matches_hf_torch():
    m = _tiny_hf_model()
    enc = config_from_hf(m)
    params = convert_hf_wav2vec2(m)

    wav = np.random.default_rng(0).standard_normal((2, 800)).astype(np.float32)
    with torch.no_grad():
        ref = m(torch.from_numpy(wav)).last_hidden_state.numpy()
    ours = np.asarray(enc.apply(params, jnp.asarray(wav)))
    assert ours.shape == ref.shape
    # f32 accumulation-order noise through 2 conv + 2 transformer layers
    np.testing.assert_allclose(ours, ref, rtol=1e-3, atol=1e-4)


def test_resample_matches_torch_align_corners():
    import torch.nn.functional as F

    x = np.random.default_rng(1).standard_normal((2, 13, 5)).astype(np.float32)
    for out_len in (1, 7, 13, 29):
        ref = F.interpolate(
            torch.from_numpy(x).transpose(1, 2), size=out_len,
            mode="linear", align_corners=True,
        ).transpose(1, 2).numpy()
        ours = np.asarray(resample_frames_aligned(jnp.asarray(x), out_len))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5,
                                   err_msg=str(out_len))


def test_encode_audio_frame_alignment():
    m = _tiny_hf_model()
    enc = config_from_hf(m)
    params = convert_hf_wav2vec2(m)
    wav = np.random.default_rng(2).standard_normal((1, 1600)).astype(np.float32)
    out = encode_audio(params, jnp.asarray(wav), frame_num=12, model=enc)
    assert out.shape == (1, 12, 32)
    assert np.isfinite(np.asarray(out)).all()
