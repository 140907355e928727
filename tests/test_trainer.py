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


def test_vgg_loss_in_default_train_path(tmp_path):
    """VERDICT r2 #3: TrainConfig.use_vgg_loss must be honored by the
    shipped training path — the step logs a `vgg` term by default."""
    tc = TrainConfig(
        batch_size=2, epochs=1, lr=1e-3, bf16_compute=False,
        use_vgg_loss=True, ckpt_dir=str(tmp_path / "ckpt"),
    )
    train = synthetic_dataset(TINY, num_frames=2, seed=0)
    t = Trainer(TINY, tc, train, None)
    hist = t.train(epochs=1)
    assert "vgg" in hist[0], hist[0].keys()
    assert np.isfinite(hist[0]["vgg"]) and hist[0]["vgg"] > 0


def test_validate_reports_lpips_and_stamps_checkpoint(tmp_path):
    """VERDICT r2 #5: validate() returns SSIM/PSNR/LPIPS when alex weights
    are supplied, and the metrics are stamped into the checkpoint meta
    (the reference embeds them in filenames, talker_trainer.py:920-937)."""
    import json

    import jax

    from nerf3dtalker_tpu.utils.metrics import AlexNetFeatures

    lp_params = AlexNetFeatures().init(
        jax.random.key(0), jnp.zeros((1, 64, 64, 3))
    )
    lins = [jnp.ones((c,)) / c for c in (64, 192, 384, 256, 256)]
    t = _trainer(tmp_path, lpips=(lp_params, lins))
    hist = t.train(epochs=1)
    assert {"SSIM", "PSNR", "LPIPS"} <= set(hist[0])
    assert np.isfinite(hist[0]["LPIPS"])
    metas = [f for f in os.listdir(t.train_cfg.ckpt_dir)
             if f.startswith("meta_")]
    assert metas
    with open(os.path.join(t.train_cfg.ckpt_dir, sorted(metas)[-1])) as f:
        meta = json.load(f)
    assert {"SSIM", "PSNR", "LPIPS"} <= set(meta["metrics"])
    # viewable side-by-side validation dumps (PNG, not raw arrays)
    dump_root = os.path.join(t.train_cfg.log_dir, "temp_image")
    pngs = []
    for root, _, files in os.walk(dump_root):
        pngs += [f for f in files if f.endswith(".png")]
    assert pngs


def test_trainer_full_cycle_under_mesh(tmp_path):
    """Epoch + validation through the sharded step fns on the 8-device
    virtual mesh (validation batches sized to the data axis)."""
    from nerf3dtalker_tpu.parallel import make_mesh

    mesh = make_mesh(data=2, rays=4)
    tc = TrainConfig(
        batch_size=2, epochs=1, lr=1e-3, bf16_compute=False,
        use_vgg_loss=False, ckpt_dir=str(tmp_path / "ckpt"),
    )
    train = synthetic_dataset(TINY, num_frames=4, seed=0)
    val = synthetic_dataset(TINY, num_frames=2, seed=1)
    t = Trainer(TINY, tc, train, val, mesh=mesh)
    hist = t.train(epochs=1)
    assert "SSIM" in hist[0] and np.isfinite(hist[0]["total_loss"])
