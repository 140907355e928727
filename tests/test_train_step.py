"""Training-step integration test: loss decreases on a tiny overfit task."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf3dtalker_tpu.config import NeRFConfig, TrainConfig
from nerf3dtalker_tpu.train.step import build_step_fns
from nerf3dtalker_tpu.utils.camera import base_cam, ray_grid

TINY = NeRFConfig(
    featmap_size=8, featmap_nc=32, pred_img_size=32, num_sample_coarse=8,
    mlp_hidden=32,
)


def _batch(B=2, seed=0):
    rng = np.random.default_rng(seed)
    xy, _ = ray_grid(TINY.featmap_size)
    cam = base_cam(TINY.featmap_size)
    f32 = np.float32
    return {
        "mels": jnp.asarray(rng.standard_normal((B, 80, 16)).astype(f32)),
        "gt_rgb": jnp.asarray(rng.uniform(0, 1, (B, 32, 32, 3)).astype(f32)),
        "head_mask": jnp.asarray((rng.uniform(0, 1, (B, 32, 32, 1)) > 0.4).astype(f32)),
        "iden": jnp.asarray(rng.standard_normal((B, 100)).astype(f32) * 0.1),
        "expr": jnp.asarray(rng.standard_normal((B, 79)).astype(f32) * 0.1),
        "text": jnp.asarray(rng.standard_normal((B, 100)).astype(f32) * 0.1),
        "illu": jnp.asarray(rng.standard_normal((B, 27)).astype(f32) * 0.1),
        "audio_exp": jnp.asarray(rng.standard_normal((B, 64)).astype(f32) * 0.1),
        "Rmat": jnp.asarray(np.tile(cam.Rmat, (B, 1, 1))),
        "Tvec": jnp.asarray(np.tile(cam.Tvec, (B, 1))),
        "inv_inmat": jnp.asarray(np.tile(cam.inv_inmat, (B, 1, 1))),
        "xy": jnp.asarray(np.tile(xy, (B, 1, 1))),
    }


def test_train_step_runs_and_descends():
    fns = build_step_fns(
        TINY, TrainConfig(lr=3e-3, bf16_compute=False, use_vgg_loss=False)
    )
    batch = _batch()
    state = fns.init(jax.random.key(0), batch)
    state, losses0 = fns.train_step(state, batch, jax.random.key(1))
    for i in range(30):
        state, losses = fns.train_step(state, batch, jax.random.key(i + 2))
    assert float(losses["total_loss"]) < float(losses0["total_loss"])
    assert np.isfinite(float(losses["total_loss"]))
    assert int(state.step) == 31


def test_eval_step_outputs():
    fns = build_step_fns(TINY, TrainConfig(bf16_compute=False))
    batch = _batch()
    state = fns.init(jax.random.key(0), batch)
    img, losses = fns.eval_step(state.params, batch)
    assert img.shape == (2, 32, 32, 3)
    for k in ("bg_loss", "head_loss", "nonhead_loss", "total_loss"):
        assert np.isfinite(float(losses[k])), k


def test_bf16_compute_path():
    fns = build_step_fns(TINY, TrainConfig(bf16_compute=True))
    batch = _batch()
    state = fns.init(jax.random.key(0), batch)
    state, losses = fns.train_step(state, batch, jax.random.key(1))
    assert np.isfinite(float(losses["total_loss"]))
    # params stay f32 even with bf16 compute
    leaf = jax.tree.leaves(state.params)[0]
    assert leaf.dtype == jnp.float32


def test_vgg_precomputed_gt_feats_match_inline():
    """Precomputed masked-GT VGG activations (parameter-independent)
    produce the identical loss to the inline two-branch form."""
    import jax

    from nerf3dtalker_tpu.models.perceptual import (
        init_vgg16,
        vgg_features,
        vgg_perceptual_loss,
    )

    rng = np.random.default_rng(0)
    vggp = init_vgg16(jax.random.key(0))
    pred = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0, 1, (1, 64, 64, 3)).astype(np.float32))
    inline = vgg_perceptual_loss(vggp, pred, gt)
    feats = vgg_features(vggp, gt)
    pre = vgg_perceptual_loss(vggp, pred, target_feats=feats)
    np.testing.assert_allclose(float(inline), float(pre), rtol=1e-6)
    # bf16 compute stays close to the f32 loss
    bf16 = vgg_perceptual_loss(vggp, pred, gt, compute_dtype=jnp.bfloat16)
    np.testing.assert_allclose(float(inline), float(bf16), rtol=5e-2)
