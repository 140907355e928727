"""Trainer-driver integration: 2 epochs on a synthetic dataset, metrics,
checkpoint save/resume, soft partial loading."""

import os

import jax.numpy as jnp
import numpy as np

from nerf3dtalker_tpu.config import NeRFConfig, TrainConfig
from nerf3dtalker_tpu.data.dataset import synthetic_dataset
from nerf3dtalker_tpu.train.trainer import Trainer
from nerf3dtalker_tpu.utils.checkpoints import soft_load, widen_input_channels

TINY = NeRFConfig(
    featmap_size=8, featmap_nc=32, pred_img_size=32, num_sample_coarse=8,
    mlp_hidden=32,
)


def _trainer(tmp_path, **kw):
    tc = TrainConfig(
        batch_size=2, epochs=2, lr=1e-3, bf16_compute=False,
        use_vgg_loss=False, ckpt_dir=str(tmp_path / "ckpt"),
    )
    train = synthetic_dataset(TINY, num_frames=4, seed=0)
    val = synthetic_dataset(TINY, num_frames=2, seed=1)
    return Trainer(TINY, tc, train, val, **kw)


def test_trainer_two_epochs_and_metrics(tmp_path):
    t = _trainer(tmp_path)
    hist = t.train(epochs=2)
    assert len(hist) == 2
    assert "SSIM" in hist[-1] and "PSNR" in hist[-1]
    assert -1.0 <= hist[-1]["SSIM"] <= 1.0
    assert hist[-1]["PSNR"] > 0
    # training reduces loss across epochs on this overfit task
    assert hist[1]["total_loss"] <= hist[0]["total_loss"] * 1.5
    # checkpoint written
    assert any(d.startswith("state_") for d in os.listdir(t.train_cfg.ckpt_dir))


def test_checkpoint_resume_roundtrip(tmp_path):
    t = _trainer(tmp_path)
    t.train(epochs=1)
    step = int(t.state.step)
    leaf0 = np.asarray(
        t.state.params["nerf"]["params"]["fg_CD_predictor"]["fea_0_kernel"]
    ).copy()

    t2 = _trainer(tmp_path)
    t2.init()
    restored_step = t2.resume(t.train_cfg.ckpt_dir)
    assert restored_step == step
    leaf1 = np.asarray(
        t2.state.params["nerf"]["params"]["fg_CD_predictor"]["fea_0_kernel"]
    )
    np.testing.assert_array_equal(leaf0, leaf1)


def test_soft_load_partial():
    src = {"a": jnp.ones((3, 3)), "b": jnp.ones((2,)), "c": jnp.ones((4,))}
    tgt = {"a": jnp.zeros((3, 3)), "b": jnp.zeros((5,)), "d": jnp.zeros((1,))}
    out = soft_load(tgt, src)
    np.testing.assert_allclose(np.asarray(out["a"]), 1.0)   # shape match: copied
    np.testing.assert_allclose(np.asarray(out["b"]), 0.0)   # shape mismatch: kept
    np.testing.assert_allclose(np.asarray(out["d"]), 0.0)   # absent in src: kept


def test_widen_input_channels():
    k = np.ones((4, 8), np.float32)
    w = widen_input_channels(k, 6)
    assert w.shape == (6, 8)
    np.testing.assert_allclose(w[:4], 1.0)
    np.testing.assert_allclose(w[4:], 0.0)
