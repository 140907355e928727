"""Round-5 resume ergonomics: compiled-program reuse on same-process
resume (TRAIN_r04's post-resume recompile fix) and CLI flag forwarding
over the checkpoint's stored config."""

import numpy as np

from nerf3dtalker_tpu.cli import main
from nerf3dtalker_tpu.config import NeRFConfig, TrainConfig
from nerf3dtalker_tpu.data.dataset import coherent_subject
from nerf3dtalker_tpu.train.trainer import Trainer

TINY = NeRFConfig(
    featmap_size=8, featmap_nc=32, pred_img_size=32, num_sample_coarse=8,
    mlp_hidden=32,
)


def _tc(tmp_path, **kw):
    kw.setdefault("batch_size", 2)
    kw.setdefault("epochs", 2)
    kw.setdefault("use_vgg_loss", False)
    kw.setdefault("bf16_compute", False)
    kw.setdefault("device_cache", True)
    return TrainConfig(
        ckpt_dir=str(tmp_path / "ckpt"), log_dir=str(tmp_path / "logs"), **kw
    )


def test_from_checkpoint_reuses_compiled_programs(tmp_path):
    data = coherent_subject(TINY, num_frames=4)
    t = Trainer(TINY, _tc(tmp_path), data)
    t.train(epochs=1)
    t2 = Trainer.from_checkpoint(
        str(tmp_path / "ckpt"), data, reuse_from=t, epochs=2
    )
    assert t2.fns is t.fns
    assert t2._cached_step_fn is t._cached_step_fn
    h = t2.train(epochs=2)
    assert h and np.isfinite(h[-1]["total_loss"])


def test_from_checkpoint_rejects_mismatched_reuse(tmp_path):
    data = coherent_subject(TINY, num_frames=4)
    t = Trainer(TINY, _tc(tmp_path), data)
    t.train(epochs=1)
    t2 = Trainer.from_checkpoint(
        str(tmp_path / "ckpt"), data, reuse_from=t, epochs=2, lr=5e-4
    )
    # lr is baked into the compiled optimizer: must NOT reuse
    assert t2.fns is not t.fns


def test_train_eval_split_metrics(tmp_path):
    data = coherent_subject(TINY, num_frames=6)
    val = coherent_subject(TINY, num_frames=2, t0=6)
    tr_eval = coherent_subject(TINY, num_frames=2)
    t = Trainer(
        TINY, _tc(tmp_path), data, val_data=val, train_eval_data=tr_eval
    )
    hist = t.train(epochs=1)
    assert "PSNR" in hist[-1] and "TRAIN_PSNR" in hist[-1]
    assert np.isfinite(hist[-1]["TRAIN_PSNR"])


def test_cli_resume_forwards_explicit_flags(tmp_path, capsys):
    base = [
        "train", "--featmap-size", "8", "--img-size", "32",
        "--no-vgg", "--epochs", "1", "--batch-size", "2",
        "--ckpt-dir", str(tmp_path / "ckpt"),
        "--log-dir", str(tmp_path / "logs"),
    ]
    main(base)
    capsys.readouterr()
    # keep --ckpt-dir (resume must find the first run's checkpoint);
    # replace only the --log-dir pair
    main(base[:-2] + ["--epochs", "2", "--resume", "--guard-policy",
                      "rollback", "--log-dir", str(tmp_path / "logs2")])
    out = capsys.readouterr().out
    assert "forwarding explicitly-set flags" in out
    assert "guard_policy" in out and "log_dir" in out
