"""Mel pipeline tests: STFT/mel-filterbank vs scipy/torch oracles, chunking
shape/range properties."""

import numpy as np
import torch

from nerf3dtalker_tpu.data.mel import (
    blink_ratio_sequence,
    mel_filterbank,
    melspectrogram,
    per_frame_mel_chunks,
    stft,
)


def test_stft_matches_torch():
    rng = np.random.default_rng(0)
    y = rng.standard_normal(16000).astype(np.float64)
    got = stft(y, n_fft=800, hop=200, win=800)
    want = torch.stft(
        torch.from_numpy(y), n_fft=800, hop_length=200, win_length=800,
        window=torch.hann_window(800, dtype=torch.float64),
        center=True, pad_mode="reflect", return_complex=True,
    ).numpy()
    assert got.shape == want.shape
    np.testing.assert_allclose(np.abs(got), np.abs(want), rtol=1e-6, atol=1e-8)


def test_mel_filterbank_properties():
    fb = mel_filterbank(16000, 800, 80, 55.0, 7600.0)
    assert fb.shape == (80, 401)
    assert np.all(fb >= 0)
    # every filter has support; centers increase monotonically
    assert np.all(fb.sum(axis=1) > 0)
    centers = fb.argmax(axis=1)
    assert np.all(np.diff(centers) >= 0)
    # low filters are narrow (linear region), high are wide (log region)
    width = (fb > 0).sum(axis=1)
    assert width[-1] > width[0]


def test_melspectrogram_range_and_shape():
    rng = np.random.default_rng(1)
    wav = (rng.standard_normal(32000) * 0.1).astype(np.float32)
    m = melspectrogram(wav)
    assert m.shape[0] == 80
    assert m.min() >= -4.0 and m.max() <= 4.0
    # silence maps to the floor
    msil = melspectrogram(np.zeros(16000, np.float32))
    np.testing.assert_allclose(msil, -4.0, atol=1e-5)


def test_per_frame_chunks():
    rng = np.random.default_rng(2)
    wav = (rng.standard_normal(32000) * 0.1).astype(np.float32)  # 2 s
    chunks = per_frame_mel_chunks(wav)
    assert chunks.shape == (50, 80, 16)  # 25 fps * 2 s
    # frame 0 starts clamped at mel index 0 -> its first columns repeat col 0
    np.testing.assert_allclose(chunks[0][:, 0], chunks[0][:, 1])


def test_blink_ratio():
    r = blink_ratio_sequence(100, np.random.default_rng(0))
    assert r.shape == (100, 1)
    assert r.max() <= 1.0 and r.min() >= 0.0
    assert (r > 0).any()  # at least one blink in 4 s
    assert blink_ratio_sequence(10, np.random.default_rng(0)).max() == 0


def test_tts_placeholder_to_mel_chunks():
    """text -> placeholder wav -> per-frame mel chunks, end to end."""
    import wave

    from nerf3dtalker_tpu.data.mel import per_frame_mel_chunks
    from nerf3dtalker_tpu.data.tts import synthesize_placeholder

    path = synthesize_placeholder("hello tpu nerf world")
    with wave.open(path, "rb") as f:
        assert f.getframerate() == 16000
        n = f.getnframes()
        pcm = np.frombuffer(f.readframes(n), np.int16).astype(np.float32) / 32768.0
    assert n > 16000 * 1.0  # 4 words at 2.5 wps -> ~1.6 s

    chunks = per_frame_mel_chunks(pcm, sr=16000, fps=25)
    assert chunks.shape[1:] == (80, 16)
    assert chunks.shape[0] >= 25
    assert np.isfinite(chunks).all()
    # determinism: same text -> identical audio
    path2 = synthesize_placeholder("hello tpu nerf world")
    with wave.open(path2, "rb") as f:
        pcm2 = np.frombuffer(f.readframes(f.getnframes()), np.int16)
    np.testing.assert_array_equal(pcm2, (pcm * 32768.0).astype(np.int16))
