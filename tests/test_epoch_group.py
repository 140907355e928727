"""Grouped-epoch device program (round-5 tunnel-latency optimization):
running K epochs as one compiled program must be semantically IDENTICAL
to K per-epoch programs — same shuffle orders, same per-step rng keys,
same final parameters."""

import jax
import numpy as np

from nerf3dtalker_tpu.config import NeRFConfig, TrainConfig
from nerf3dtalker_tpu.data.dataset import coherent_subject
from nerf3dtalker_tpu.train.trainer import Trainer

TINY = NeRFConfig(
    featmap_size=8, featmap_nc=32, pred_img_size=32, num_sample_coarse=8,
    mlp_hidden=32,
)


def _run(tmp_path, tag, val_every):
    data = coherent_subject(TINY, num_frames=8)
    tc = TrainConfig(
        batch_size=2, epochs=4, use_vgg_loss=False, bf16_compute=False,
        ckpt_dir=str(tmp_path / f"ckpt_{tag}"),
        log_dir=str(tmp_path / f"logs_{tag}"),
        val_every=val_every, device_cache=True,
    )
    t = Trainer(TINY, tc, data)
    t.init(seed=0)
    hist = t.train(epochs=4)
    return t, hist


def test_grouped_epochs_match_per_epoch(tmp_path):
    t1, h1 = _run(tmp_path, "per", val_every=1)     # group size 1
    t4, h4 = _run(tmp_path, "grp", val_every=4)     # one 4-epoch program
    assert len(h1) == len(h4) == 4
    for a, b in zip(h1, h4):
        assert abs(a["total_loss"] - b["total_loss"]) < 1e-5, (a, b)
    leaves1 = jax.tree.leaves(t1.state.params)
    leaves4 = jax.tree.leaves(t4.state.params)
    for x, y in zip(leaves1, leaves4):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=0, atol=0,
            err_msg="grouped epochs diverged from per-epoch training",
        )
    assert int(t1.state.step) == int(t4.state.step) == 16
