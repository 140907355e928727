"""Multi-device tests on the virtual 8-CPU mesh: sharded train step parity
with single-device, and PartialFC sharded-softmax parity vs dense CE."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf3dtalker_tpu.config import NeRFConfig, TrainConfig
from nerf3dtalker_tpu.parallel import make_mesh, sharded_softmax_ce
from nerf3dtalker_tpu.parallel.mesh import shard_batch
from nerf3dtalker_tpu.parallel.partial_fc import arcface_margin, cosface_margin
from nerf3dtalker_tpu.train.step import build_step_fns
from nerf3dtalker_tpu.utils.camera import base_cam, ray_grid

TINY = NeRFConfig(
    featmap_size=8, featmap_nc=32, pred_img_size=32, num_sample_coarse=8,
    mlp_hidden=32,
)


def _batch(B=4, seed=0):
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


def test_eight_cpu_devices_available():
    assert len(jax.devices()) == 8


def test_sharded_train_step_matches_single_device():
    tc = TrainConfig(lr=1e-3, bf16_compute=False, use_vgg_loss=False)
    batch = _batch()
    fns1 = build_step_fns(TINY, tc)
    state1 = fns1.init(jax.random.key(0), batch)

    mesh = make_mesh(data=2, rays=4)
    fns8 = build_step_fns(TINY, tc, mesh=mesh)
    state8 = fns8.init(jax.random.key(0), batch)
    sbatch = shard_batch(batch, mesh)

    s1, l1 = fns1.train_step(state1, batch, jax.random.key(1))
    s8, l8 = fns8.train_step(state8, sbatch, jax.random.key(1))
    np.testing.assert_allclose(
        float(l1["total_loss"]), float(l8["total_loss"]), rtol=1e-5
    )
    # params identical after one step
    p1 = jax.tree.leaves(s1.params)
    p8 = jax.tree.leaves(s8.params)
    for a, b in zip(p1, p8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-6)


def test_sharded_softmax_matches_dense():
    mesh = make_mesh(data=1, rays=1, model=8)
    rng = np.random.default_rng(0)
    B, D, C = 16, 32, 64
    feats = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    weight = jnp.asarray(rng.standard_normal((C, D)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, C, B))

    loss = sharded_softmax_ce(mesh, feats, weight, labels)

    logits = np.asarray(feats) @ np.asarray(weight).T
    lse = np.log(np.exp(logits - logits.max(-1, keepdims=True)).sum(-1)) + logits.max(-1)
    want = np.mean(lse - logits[np.arange(B), np.asarray(labels)])
    np.testing.assert_allclose(float(loss), want, rtol=1e-5)


def test_sharded_softmax_grads_match_dense():
    mesh = make_mesh(data=1, rays=1, model=8)
    rng = np.random.default_rng(1)
    B, D, C = 8, 16, 32
    feats = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    weight = jnp.asarray(rng.standard_normal((C, D)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, C, B))

    g_sh = jax.grad(
        lambda f, w: sharded_softmax_ce(mesh, f, w, labels), argnums=(0, 1)
    )(feats, weight)

    def dense(f, w):
        logits = f @ w.T
        return jnp.mean(
            jax.nn.logsumexp(logits, axis=-1)
            - jnp.take_along_axis(logits, labels[:, None], axis=-1)[:, 0]
        )

    g_d = jax.grad(dense, argnums=(0, 1))(feats, weight)
    for a, b in zip(g_sh, g_d):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("margin", [cosface_margin, arcface_margin])
def test_margin_heads_run(margin):
    mesh = make_mesh(data=1, rays=1, model=4)
    rng = np.random.default_rng(2)
    B, D, C = 8, 16, 32
    feats = rng.standard_normal((B, D)).astype(np.float32)
    feats /= np.linalg.norm(feats, axis=-1, keepdims=True)
    weight = rng.standard_normal((C, D)).astype(np.float32)
    weight /= np.linalg.norm(weight, axis=-1, keepdims=True)
    labels = jnp.asarray(rng.integers(0, C, B))
    loss = sharded_softmax_ce(
        mesh, jnp.asarray(feats), jnp.asarray(weight), labels,
        margin_logit_fn=margin(),
    )
    assert np.isfinite(float(loss))
    # margin penalizes the target class -> loss above no-margin scaled CE
    loss_nm = sharded_softmax_ce(
        mesh, jnp.asarray(feats), jnp.asarray(weight), labels,
        margin_logit_fn=lambda l, ll, ins: l * 64.0,
    )
    assert float(loss) > float(loss_nm)


def test_sampled_softmax_full_rate_matches_dense():
    """sample_rate=1.0 keeps every class -> identical to the dense CE."""
    from nerf3dtalker_tpu.parallel.partial_fc import sharded_sampled_softmax_ce

    mesh = make_mesh(data=1, rays=1, model=4)
    rng = np.random.default_rng(3)
    B, D, C = 8, 16, 32
    feats = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    weight = jnp.asarray(rng.standard_normal((C, D)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, C, B))

    loss = sharded_sampled_softmax_ce(
        mesh, feats, weight, labels, seed=jnp.int32(7), sample_rate=1.0
    )
    want = sharded_softmax_ce(mesh, feats, weight, labels)
    np.testing.assert_allclose(float(loss), float(want), rtol=1e-5)


def test_sampled_softmax_pfc01_positives_kept():
    """PFC-0.5: positives always in the sample; loss finite; only sampled
    weight rows receive gradient (partial_fc.py sparse-update semantics)."""
    from nerf3dtalker_tpu.parallel.partial_fc import sharded_sampled_softmax_ce

    mesh = make_mesh(data=1, rays=1, model=4)
    rng = np.random.default_rng(4)
    B, D, C = 8, 16, 64           # 16 classes/shard, 8 sampled/shard
    feats = jnp.asarray(rng.standard_normal((B, D)).astype(np.float32))
    weight = jnp.asarray(rng.standard_normal((C, D)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, C, B))

    def loss_fn(w):
        return sharded_sampled_softmax_ce(
            mesh, feats, w, labels, seed=jnp.int32(11), sample_rate=0.5
        )

    loss, g = jax.value_and_grad(loss_fn)(weight)
    assert np.isfinite(float(loss))
    g = np.asarray(g)
    touched = np.abs(g).sum(-1) > 0
    # every batch label's row got gradient (positives always sampled)
    assert touched[np.asarray(labels)].all()
    # sampling is sparse: at most 8 rows per 16-class shard
    assert touched.sum() <= 4 * 8
