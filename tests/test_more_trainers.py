"""disexp fusion trainer and ArcFace PartialFC trainer tests."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf3dtalker_tpu.parallel import make_mesh
from nerf3dtalker_tpu.train.arcface_trainer import build_arcface_step
from nerf3dtalker_tpu.train.disexp_trainer import build_disexp_step


def test_disexp_descends():
    init, step = build_disexp_step(lr=1e-3)
    rng = np.random.default_rng(0)
    batch = {
        "mels": jnp.asarray(rng.standard_normal((4, 80, 16)).astype(np.float32)),
        "auds_exp": jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32) * 0.1),
        "sad_exp": jnp.asarray(rng.standard_normal((4, 64)).astype(np.float32) * 0.1),
    }
    state = init(jax.random.key(0), batch)
    state, m0 = step(state, batch)
    audio0 = jax.tree.leaves(state.audio_params)[0].copy()
    for _ in range(20):
        state, m = step(state, batch)
    assert float(m["exp_loss"]) < float(m0["exp_loss"])
    # the Audio2Style encoder stays frozen (only the fusion head trains)
    np.testing.assert_array_equal(
        np.asarray(jax.tree.leaves(state.audio_params)[0]), np.asarray(audio0)
    )


def test_arcface_partialfc_step():
    mesh = make_mesh(data=2, rays=1, model=4)
    init, step = build_arcface_step(
        mesh, num_classes=32, embed_dim=64, layers=(1, 1, 1, 1),
        input_size=32, lr=0.01,
    )
    rng = np.random.default_rng(0)
    batch = {
        "images": jnp.asarray(rng.uniform(-1, 1, (8, 32, 32, 3)).astype(np.float32)),
        "labels": jnp.asarray(rng.integers(0, 32, 8)),
    }
    state = init(jax.random.key(0), batch)
    state, m0 = step(state, batch)
    for _ in range(5):
        state, m = step(state, batch)
    assert np.isfinite(float(m["loss"]))
    assert float(m["loss"]) < float(m0["loss"])
    assert int(state.step) == 6
