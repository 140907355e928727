"""Offline preprocessing orchestrator: end-to-end with and without nets."""

import numpy as np

from nerf3dtalker_tpu.data.dataset import FrameDataset
from nerf3dtalker_tpu.data.preprocess import preprocess_subject, save_subject


def test_preprocess_minimal_pipeline(tmp_path):
    rng = np.random.default_rng(0)
    T = 6
    images = rng.uniform(0, 1, (T, 32, 32, 3)).astype(np.float32)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)  # 1 s -> 25 fr

    arrays = preprocess_subject(images, wav, featmap_size=8)
    Tm = arrays["images"].shape[0]
    assert Tm == T  # limited by video frames (audio has 25)
    assert arrays["mels"].shape == (Tm, 80, 16)
    assert arrays["head_mask"].shape == (Tm, 32, 32, 1)
    assert arrays["audio_exp"].shape == (Tm, 64)
    assert arrays["Rmat"].shape == (Tm, 3, 3)

    save_subject(str(tmp_path / "subj.npz"), arrays)
    z = dict(np.load(tmp_path / "subj.npz"))
    assert set(z) == set(arrays)

    # feeds straight into FrameDataset
    from nerf3dtalker_tpu.utils.camera import ray_grid

    xy, _ = ray_grid(8)
    ds = FrameDataset({k: v for k, v in arrays.items()
                       if k not in ("lm2d", "ratios")}, xy)
    b = ds.batch(np.array([0, 1]))
    assert b["gt_rgb"].shape == (2, 32, 32, 3)


def test_preprocess_with_mock_nets():
    rng = np.random.default_rng(1)
    T = 4
    images = rng.uniform(0, 1, (T, 16, 16, 3)).astype(np.float32)
    wav = (rng.standard_normal(16000) * 0.1).astype(np.float32)

    calls = {}

    def mock_bisenet(imgs):
        calls["bisenet"] = True
        return np.ones(imgs.shape[:3], np.int32)  # class 1 = skin

    def mock_fan(imgs):
        calls["fan"] = True
        return np.tile(np.array([[8.0, 8.0]], np.float32), (len(imgs), 68, 1))

    def mock_netg(mels, ref, ratios):
        calls["netg"] = True
        return np.full((len(mels), 64), 0.5, np.float32)

    arrays = preprocess_subject(
        images, wav, bisenet_apply=mock_bisenet, fan_apply=mock_fan,
        netg_apply=mock_netg,
    )
    assert calls == {"bisenet": True, "fan": True, "netg": True}
    np.testing.assert_allclose(arrays["audio_exp"], 0.5)
    assert arrays["head_mask"].max() == 1.0
