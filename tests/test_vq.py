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


def test_sample_code_logits_and_decode_logit():
    """stage-1 sampling helpers (stage1_vocaset.py:120-149): categorical /
    top-1 code sampling and logit decoding through the codebook."""
    import jax

    from nerf3dtalker_tpu.config import VQConfig
    from nerf3dtalker_tpu.models.vq.stage1 import (
        VQAutoEncoder,
        sample_code_logits,
    )

    cfg = VQConfig(img_size=16, hidden_size=32, embed_dim=32, n_embed=64,
                   num_hidden_layers=1)
    vq = VQAutoEncoder(cfg)
    img = jnp.zeros((1, 16, 16, 3))
    au = jnp.zeros((1, cfg.n_au, cfg.au_dim))
    params = vq.init(jax.random.key(0), img, au)

    L = (16 * 32) // 32
    logits = jnp.asarray(
        np.random.default_rng(0).standard_normal((1, L, 64)).astype(np.float32)
    )
    ix, probs = sample_code_logits(jax.random.key(1), logits, sample=True)
    assert ix.shape == (1, L) and probs.shape == (1, L, 64)
    ix_top1, _ = sample_code_logits(jax.random.key(1), logits, sample=False)
    np.testing.assert_array_equal(
        np.asarray(ix_top1), np.argmax(np.asarray(logits), -1)
    )

    au_ix = jnp.zeros((1, cfg.n_au), jnp.int32)
    rec = vq.apply(params, logits, au_ix, method=VQAutoEncoder.decode_logit)
    rec2 = vq.apply(params, ix_top1, au_ix,
                    method=VQAutoEncoder.decode_from_indices)
    np.testing.assert_allclose(np.asarray(rec), np.asarray(rec2), atol=1e-6)


def test_stage2_style_interpolation():
    """Two-subject style blending at predict time (stage2.py:108-114):
    weight 1.0 reproduces subject A, weight 0.0 subject B, and 0.5 is a
    genuinely different output."""
    import jax

    from nerf3dtalker_tpu.config import VQConfig
    from nerf3dtalker_tpu.models.vq.stage2 import CodeTalker

    cfg = VQConfig(embed_dim=8, face_quan_num=2, n_embed=16)
    model = CodeTalker(cfg, feature_dim=16, n_subjects=3, vertice_dim=12)
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((1, 10, 768)).astype(np.float32))
    motion = jnp.asarray(rng.standard_normal((1, 4, 12)).astype(np.float32))
    oa = jax.nn.one_hot(jnp.asarray([0]), 3)
    ob = jax.nn.one_hot(jnp.asarray([1]), 3)
    params = model.init(jax.random.key(0), feats, motion, oa)
    # zero-init feat_map head makes outputs identical; probe the style
    # path through a non-zero head
    params = jax.tree_util.tree_map_with_path(
        lambda p, v: jnp.ones_like(v) * 0.01
        if "feat_map" in jax.tree_util.keystr(p) else v, params,
    )
    a = model.apply(params, feats, motion, oa)
    b = model.apply(params, feats, motion, ob)
    w1 = model.apply(params, feats, motion, oa,
                     subject_onehot2=ob, style_weight=1.0)
    w0 = model.apply(params, feats, motion, oa,
                     subject_onehot2=ob, style_weight=0.0)
    mid = model.apply(params, feats, motion, oa,
                      subject_onehot2=ob, style_weight=0.5)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(a), atol=1e-6)
    np.testing.assert_allclose(np.asarray(w0), np.asarray(b), atol=1e-6)
    assert np.abs(np.asarray(mid) - np.asarray(a)).max() > 0
