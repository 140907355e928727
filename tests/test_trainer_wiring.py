"""Round-4 Trainer wiring: self-describing checkpoints (from_checkpoint /
--resume), MetricLogger JSONL stream, profiler trace capture, and the
StepGuard rollback policy on synthetic-NaN epochs.

Reference analogs: the `para` config block embedded in checkpoints
(talker_trainer.py:915-918, consumed at train.py:18-22), the SummaryWriter
metric stream (talker_trainer.py:623, train_vq.py:108), and the manual
resume-from-checkpoint recovery (talker_trainer.py:1167-1201).
"""

import json
import os

import numpy as np
import pytest

from nerf3dtalker_tpu.config import NeRFConfig, TrainConfig
from nerf3dtalker_tpu.data.dataset import synthetic_dataset
from nerf3dtalker_tpu.train.trainer import Trainer

TINY = NeRFConfig(
    featmap_size=8, featmap_nc=32, pred_img_size=32, num_sample_coarse=8,
    mlp_hidden=32,
)


def _trainer(tmp_path, **tc_kw):
    kw = dict(
        batch_size=2, epochs=2, lr=1e-3, bf16_compute=False,
        use_vgg_loss=False, ckpt_dir=str(tmp_path / "ckpt"),
        log_dir="",
    )
    kw.update(tc_kw)
    tc = TrainConfig(**kw)
    train = synthetic_dataset(TINY, num_frames=4, seed=0)
    val = synthetic_dataset(TINY, num_frames=2, seed=1)
    return Trainer(TINY, tc, train, val)


def _leaf(state):
    return np.asarray(
        state.params["nerf"]["params"]["fg_CD_predictor"]["fea_0_kernel"]
    )


def test_from_checkpoint_rebuilds_without_external_config(tmp_path):
    t = _trainer(tmp_path, lr=3e-4)
    t.train(epochs=1)
    step = int(t.state.step)
    want = _leaf(t.state).copy()

    # from the path ALONE: no NeRFConfig/TrainConfig supplied
    train = synthetic_dataset(TINY, num_frames=4, seed=0)
    val = synthetic_dataset(TINY, num_frames=2, seed=1)
    t2 = Trainer.from_checkpoint(t.train_cfg.ckpt_dir, train, val)
    assert t2.nerf_cfg == TINY
    assert t2.train_cfg.lr == 3e-4
    assert int(t2.state.step) == step
    assert t2.start_epoch == 1
    np.testing.assert_array_equal(_leaf(t2.state), want)

    # overrides win over the stored config
    t3 = Trainer.from_checkpoint(
        t.train_cfg.ckpt_dir, train, val, epochs=5
    )
    assert t3.train_cfg.epochs == 5

    # and the run continues (epoch counter resumes past the stored epoch)
    hist = t2.train(epochs=2)
    assert hist[-1]["epoch"] == 1
    assert int(t2.state.step) == 2 * step


def test_from_checkpoint_without_embedded_config_raises(tmp_path):
    from nerf3dtalker_tpu.utils import checkpoints as ckpt

    t = _trainer(tmp_path)
    t.init()
    d = str(tmp_path / "bare")
    ckpt.save_checkpoint(d, t.state, config=None, step=0)
    with pytest.raises(ValueError, match="no embedded config"):
        Trainer.from_checkpoint(d, t.train_data)


def test_metric_logger_and_trace_wired(tmp_path):
    logd = tmp_path / "logs"
    traced = tmp_path / "trace"
    t = _trainer(
        tmp_path, log_dir=str(logd), metric_log=True,
        trace_dir=str(traced), trace_steps=1,
    )
    hist = t.train(epochs=2)
    assert len(hist) == 2
    # per-epoch JSONL from the device-side accumulated losses
    mpath = logd / "metrics.jsonl"
    assert mpath.exists()
    recs = [json.loads(l) for l in mpath.read_text().splitlines()]
    assert len(recs) == 2
    for r in recs:
        assert "total_loss" in r and "SSIM" in r and "step" in r
    assert recs[1]["step"] > recs[0]["step"]
    # the profiler capture produced an artifact dir
    found = [f for _, _, fs in os.walk(traced) for f in fs]
    assert found, "trace dir is empty"


def test_stepguard_rollback_restores_checkpoint(tmp_path):
    t = _trainer(tmp_path, guard_policy="rollback")
    t.train(epochs=1)          # 1 good epoch -> checkpoint at step 2
    good_step = int(t.state.step)
    want = _leaf(t.state).copy()

    # poison the inputs: every step of the next epoch produces NaN grads
    t.train_data.arrays["mels"][:] = np.nan
    if t._use_device_cache:     # re-upload so the poison reaches the device
        t.train_data.to_device(t.train_cfg.batch_size)
    hist = t.train(epochs=2)   # re-runs epoch 0.. (start_epoch still 0)
    bad = [r for r in hist if r.get("rollback")]
    assert bad, "no rollback epoch recorded"
    assert bad[-1]["finite_step"] == 0.0
    # state (params AND step) is back at the last good checkpoint
    assert int(t.state.step) == good_step
    np.testing.assert_array_equal(_leaf(t.state), want)
    assert t.guard.rollbacks >= 1


def test_nan_step_does_not_poison_optimizer_state(tmp_path):
    """A non-finite step must leave Adam's moments untouched, or every
    later step would be NaN regardless of the param guard."""
    import jax

    t = _trainer(tmp_path)
    t.init()
    batch = t.train_data.batch(np.arange(2))
    st1, l1 = t.fns.train_step(t.state, batch, jax.random.key(0))
    assert float(l1["finite_step"]) == 1.0
    bad = dict(batch)
    bad["mels"] = np.full_like(batch["mels"], np.nan)
    st2, l2 = t.fns.train_step(st1, bad, jax.random.key(1))
    assert float(l2["finite_step"]) == 0.0
    # a following good step recovers cleanly
    st3, l3 = t.fns.train_step(st2, batch, jax.random.key(2))
    assert float(l3["finite_step"]) == 1.0
    assert np.all(np.isfinite(_leaf(st3)))


def test_lpips_npz_roundtrip(tmp_path):
    """save_lpips_alex -> load_lpips_alex preserves the metric exactly
    (the portable path for images without the `lpips` torch package;
    CLI: train --lpips-weights)."""
    import jax
    import jax.numpy as jnp

    from nerf3dtalker_tpu.utils.metrics import (
        AlexNetFeatures,
        load_lpips_alex,
        lpips_alex,
        save_lpips_alex,
    )

    params = AlexNetFeatures().init(jax.random.key(0), jnp.zeros((1, 64, 64, 3)))
    lins = [jnp.abs(jax.random.normal(jax.random.key(i), (c,)))
            for i, c in enumerate((64, 192, 384, 256, 256))]
    p = str(tmp_path / "lpips_alex.npz")
    save_lpips_alex(p, params, lins)
    params2, lins2 = load_lpips_alex(p)
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    b = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    d1 = float(lpips_alex(params, lins, a, b)[0])
    d2 = float(lpips_alex(params2, lins2, a, b)[0])
    assert np.isclose(d1, d2, rtol=1e-6)
    assert d1 > 0


def test_device_cache_matches_host_loader(tmp_path):
    """The device-resident dataset cache (on-device batch gathers) must
    train identically to the host loader — same data, same order, same
    losses."""
    t_dev = _trainer(tmp_path / "a")
    t_host = _trainer(tmp_path / "b", device_cache=False)
    assert t_dev._use_device_cache
    assert not t_host._use_device_cache
    h1 = t_dev.train(epochs=1)
    h2 = t_host.train(epochs=1)
    assert np.isclose(h1[0]["total_loss"], h2[0]["total_loss"], rtol=1e-5)
    np.testing.assert_allclose(_leaf(t_dev.state), _leaf(t_host.state),
                               rtol=1e-5, atol=1e-7)


def test_latest_step_ignores_interrupted_orbax_saves(tmp_path):
    """An interrupted orbax save leaves `state_N.orbax-checkpoint-tmp-*`
    litter; resume/rollback must still find the last COMPLETE step."""
    from nerf3dtalker_tpu.utils.checkpoints import has_checkpoint, latest_step

    d = tmp_path / "ckpt"
    d.mkdir()
    (d / "state_4").mkdir()
    (d / "state_6.orbax-checkpoint-tmp-1734".replace("/", "_")).mkdir()
    assert latest_step(str(d)) == 4
    assert has_checkpoint(str(d))
    # nothing but litter -> cleanly reports no checkpoint
    d2 = tmp_path / "only_tmp"
    d2.mkdir()
    (d2 / "state_2.orbax-checkpoint-tmp-9").mkdir()
    assert not has_checkpoint(str(d2))


def test_from_checkpoint_targets_resumed_directory(tmp_path):
    """Resuming from a moved/copied checkpoint directory must save (and
    rollback) THERE, not to the ckpt_dir stored in the metadata."""
    import shutil

    t = _trainer(tmp_path)
    t.train(epochs=1)
    moved = str(tmp_path / "moved_ckpt")
    shutil.copytree(t.train_cfg.ckpt_dir, moved)

    train = synthetic_dataset(TINY, num_frames=4, seed=0)
    t2 = Trainer.from_checkpoint(moved, train)
    assert t2.train_cfg.ckpt_dir == moved
    # explicit override still wins
    t3 = Trainer.from_checkpoint(moved, train, ckpt_dir=str(tmp_path / "x"))
    assert t3.train_cfg.ckpt_dir == str(tmp_path / "x")
