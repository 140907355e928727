"""Standardized-Space (VQ) tests: quantizer math, stage-1 autoencoder, AU
classifiers."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from nerf3dtalker_tpu.config import VQConfig
from nerf3dtalker_tpu.models.vq import AUClassifier, VQAutoEncoder, VectorQuantizer
from nerf3dtalker_tpu.models.vq.au_classifier import au_bce_loss, au_dice_loss

TINY_VQ = VQConfig(
    hidden_size=64, embed_dim=16, n_embed=32, n_embed_au=8,
    num_hidden_layers=2, num_attention_heads=4, intermediate_size=128,
    img_size=16, au_dim=24, n_au=5,
)


def test_quantizer_straight_through_and_loss():
    q = VectorQuantizer(n_embed=8, embed_dim=4)
    z = jnp.asarray(np.random.default_rng(0).standard_normal((2, 6, 4)).astype(np.float32))
    params = q.init(jax.random.key(0), z)
    res = q.apply(params, z)
    assert res.quantized.shape == z.shape
    assert res.indices.shape == (2, 6)
    assert float(res.loss) >= 0
    assert 1.0 <= float(res.perplexity) <= 8.0

    # straight-through: dL/dz of sum(quantized) == ones
    g = jax.grad(lambda zz: jnp.sum(q.apply(params, zz).quantized))(z)
    np.testing.assert_allclose(np.asarray(g), 1.0, atol=1e-6)

    # quantized values are actual codebook rows
    emb = params["params"]["embedding"]
    got = np.asarray(res.quantized - (z - jax.lax.stop_gradient(z)))  # == z_q
    want = np.asarray(jnp.take(emb, res.indices, axis=0))
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_quantizer_exact_code_roundtrip():
    q = VectorQuantizer(n_embed=8, embed_dim=4)
    z0 = jnp.zeros((1, 1, 4))
    params = q.init(jax.random.key(0), z0)
    emb = params["params"]["embedding"]
    res = q.apply(params, emb[3].reshape(1, 1, 4))
    assert int(res.indices[0, 0]) == 3
    assert float(res.loss) < 1e-10


def test_vq_autoencoder_forward_and_grads():
    model = VQAutoEncoder(TINY_VQ)
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    au = jnp.asarray(rng.standard_normal((2, 5, 24)).astype(np.float32))
    params = model.init(jax.random.key(0), img, au)
    out = model.apply(params, img, au)
    assert out.recon.shape == (2, 16, 16, 3)
    assert np.isfinite(float(out.quant_loss))

    def loss(p):
        o = model.apply(p, img, au)
        return jnp.mean((o.recon - img) ** 2) + o.quant_loss

    g = jax.grad(loss)(params)
    gn = [float(jnp.linalg.norm(x)) for x in jax.tree.leaves(g)]
    # codebooks must receive gradient through the commitment loss
    assert all(np.isfinite(gn))
    emb_g = g["params"]["quantize"]["embedding"]
    assert float(jnp.linalg.norm(emb_g)) > 0


def test_vq_decode_from_indices():
    model = VQAutoEncoder(TINY_VQ)
    rng = np.random.default_rng(1)
    img = jnp.asarray(rng.uniform(0, 1, (1, 16, 16, 3)).astype(np.float32))
    au = jnp.asarray(rng.standard_normal((1, 5, 24)).astype(np.float32))
    params = model.init(jax.random.key(0), img, au)
    q = model.apply(params, img, method=model.encode)
    qa = model.apply(params, au, method=model.encode_au)
    rec1 = model.apply(params, q.quantized, qa.quantized, method=model.decode)
    rec2 = model.apply(
        params, q.indices, qa.indices, method=model.decode_from_indices
    )
    np.testing.assert_allclose(np.asarray(rec1), np.asarray(rec2), atol=1e-5)


def test_au_classifier_shapes_and_losses():
    m = AUClassifier()
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (3, 112, 112, 3)).astype(np.float32))
    params = m.init(jax.random.key(0), x)
    feats, prob = m.apply(params, x)
    assert feats.shape == (3, 256)
    assert prob.shape == (3, 1)
    assert np.all(np.asarray(prob) >= 0) and np.all(np.asarray(prob) <= 1)

    t = jnp.asarray([[1.0], [0.0], [1.0]])
    assert float(au_bce_loss(prob, t)) > 0
    assert 0 <= float(au_dice_loss(prob, t)) <= 1
