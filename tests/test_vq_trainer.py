"""VQ training driver: loss descends; sharded variant matches."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf3dtalker_tpu.config import VQConfig
from nerf3dtalker_tpu.parallel import make_mesh
from nerf3dtalker_tpu.train.vq_trainer import build_vq_step

TINY = VQConfig(
    hidden_size=32, embed_dim=8, n_embed=16, n_embed_au=8,
    num_hidden_layers=1, num_attention_heads=2, intermediate_size=64,
    img_size=16, au_dim=256, n_au=5,
)


def _batch(B=2, seed=0):
    rng = np.random.default_rng(seed)
    f32 = np.float32
    return {
        "gen_img": jnp.asarray(rng.uniform(0, 1, (B, 16, 16, 3)).astype(f32)),
        "gt_img": jnp.asarray(rng.uniform(0, 1, (B, 16, 16, 3)).astype(f32)),
        "mask": jnp.asarray((rng.uniform(0, 1, (B, 16, 16, 1)) > 0.3).astype(f32)),
        "crops": jnp.asarray(rng.uniform(0, 1, (B, 5, 112, 112, 3)).astype(f32)),
        "au_labels": jnp.asarray((rng.uniform(0, 1, (B, 5)) > 0.5).astype(f32)),
    }


def test_vq_train_descends():
    init, train_step, eval_step = build_vq_step(TINY, lr=3e-4)
    batch = _batch()
    state = init(jax.random.key(0), batch)
    state, m0 = train_step(state, batch)
    for _ in range(25):
        state, m = train_step(state, batch)
    # the reconstruction term must descend on a fixed batch (total adds the
    # noisy dice/BCE AU terms on random labels)
    assert float(m["rec_loss"]) < float(m0["rec_loss"])
    assert np.isfinite(float(m["total_loss"]))
    assert np.isfinite(float(m["perplexity"]))
    ev = eval_step(state, batch)
    assert np.isfinite(float(ev["total_loss"]))


def test_vq_train_sharded_matches():
    mesh = make_mesh(data=2, rays=1)
    batch = _batch(B=4)
    init, ts1, _ = build_vq_step(TINY, lr=1e-4)
    init2, ts2, _ = build_vq_step(TINY, lr=1e-4, mesh=mesh)
    s1 = init(jax.random.key(0), batch)
    s2 = init2(jax.random.key(0), batch)
    s1, m1 = ts1(s1, batch)
    from jax.sharding import NamedSharding, PartitionSpec as P

    sb = {k: jax.device_put(v, NamedSharding(mesh, P("data")))
          for k, v in batch.items()}
    s2, m2 = ts2(s2, sb)
    np.testing.assert_allclose(
        float(m1["total_loss"]), float(m2["total_loss"]), rtol=1e-5
    )
