"""Fused BiLSTM (models/audio.py): the r5 trainer-tail optimization.

The fused path hoists all timestep input projections into one batched
matmul and runs both directions as one batched recurrence; it must match
the original flax OptimizedLSTMCell scan to fp-accumulation-order noise
under the SAME param tree (checkpoint/converter compatibility)."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf3dtalker_tpu.models.audio import Audio2Style, BiLSTM


def test_fused_matches_cell_path_bitwise():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((3, 7, 12)).astype(np.float32))
    slow = BiLSTM(5, fused=False)
    fast = BiLSTM(5, fused=True)
    p = slow.init(jax.random.key(0), x)
    # identical param trees: the fused module declares the exact
    # OptimizedLSTMCell layout (l{k}_{fwd,bwd}/{i,h}{i,f,g,o})
    p2 = fast.init(jax.random.key(0), x)
    assert (jax.tree_util.tree_structure(p)
            == jax.tree_util.tree_structure(p2))
    # same math; only fp accumulation order differs (XLA fusion choices)
    assert float(jnp.max(jnp.abs(slow.apply(p, x) - fast.apply(p, x)))) < 1e-6


def test_fused_scan_path_matches():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 40, 12)).astype(np.float32))
    slow = BiLSTM(6, fused=False)
    fast = BiLSTM(6, fused=True)       # T=40 >= unroll_below -> lax.scan
    p = slow.init(jax.random.key(0), x)
    d = float(jnp.max(jnp.abs(slow.apply(p, x) - fast.apply(p, x))))
    assert d < 1e-5


def test_audio2style_grads_flow_through_fused_rnn():
    a = Audio2Style()
    mels = jnp.asarray(
        np.random.default_rng(2).standard_normal((4, 80, 16))
        .astype(np.float32)
    )
    p = a.init(jax.random.key(0), mels)

    def loss(p):
        return jnp.sum(a.apply(p, mels) ** 2)

    g = jax.grad(loss)(p)
    norms = [float(jnp.linalg.norm(l)) for l in jax.tree.leaves(g)]
    assert all(np.isfinite(n) for n in norms)
    assert sum(n > 0 for n in norms) == len(norms)
