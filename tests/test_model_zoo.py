"""Formal tests for the wider model zoo: Wav2Lip, SyncNet, BiSeNet, S3FD,
SPECTRE, AD-NeRF audio encoders, lipreader, Audio2Pose."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf3dtalker_tpu.models.adnerf_audio import AudioAttNet, AudioNet
from nerf3dtalker_tpu.models.audio2pose import (
    Audio2PoseCVAE,
    PoseSequenceDiscriminator,
    cvae_loss,
)
from nerf3dtalker_tpu.models.bisenet import (
    BiSeNet,
    correct_head_mask,
    eye_mask_from_parsing,
    head_mask_from_parsing,
)
from nerf3dtalker_tpu.models.lipreader import VisualFrontend, lipread_loss
from nerf3dtalker_tpu.models.s3fd import S3FD, decode_boxes, nms, smooth_boxes
from nerf3dtalker_tpu.models.spectre import SpectreEncoder, TOTAL_DIM, split_deca_code
from nerf3dtalker_tpu.models.wav2lip import SyncNetColor, Wav2Lip


def test_wav2lip_generator():
    m = Wav2Lip()
    mel = jnp.zeros((1, 80, 16, 1))
    faces = jnp.zeros((1, 96, 96, 6))
    v = m.init(jax.random.key(0), mel, faces)
    out = m.apply(v, mel, faces)
    assert out.shape == (1, 96, 96, 3)
    assert float(out.min()) >= 0 and float(out.max()) <= 1


def test_syncnet_embeddings_unit_norm():
    s = SyncNetColor()
    mel = jnp.ones((2, 80, 16, 1))
    face = jnp.ones((2, 48, 96, 15))
    v = s.init(jax.random.key(0), mel, face)
    a, f = s.apply(v, mel, face)
    assert a.shape == (2, 512) and f.shape == (2, 512)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(a), axis=1), 1.0, atol=1e-4)


def test_bisenet_masks():
    m = BiSeNet()
    x = jnp.zeros((1, 64, 64, 3))
    v = m.init(jax.random.key(0), x)
    out, o16, o32 = m.apply(v, x)
    assert out.shape == (1, 64, 64, 19)
    parsing = jnp.full((1, 8, 8), 1)          # skin everywhere
    assert float(head_mask_from_parsing(parsing).sum()) == 64
    assert float(eye_mask_from_parsing(parsing).sum()) == 0
    noisy = np.zeros((16, 16), np.float32)
    noisy[4:12, 4:12] = 1
    noisy[0, 0] = 1                            # speck removed by cleanup
    clean = correct_head_mask(noisy)
    assert clean[0, 0] == 0 and clean[8, 8] == 1


def test_s3fd_pipeline():
    s = S3FD()
    img = jnp.zeros((1, 64, 64, 3))
    v = s.init(jax.random.key(0), img)
    heads = s.apply(v, img)
    assert len(heads) == 6
    assert heads[0][0].shape[-1] == 2          # max-out bg collapsed to 2

    priors = jnp.asarray([[10.0, 10.0, 4.0, 4.0]])
    boxes = decode_boxes(jnp.zeros((1, 4)), priors)
    np.testing.assert_allclose(np.asarray(boxes[0]), [8, 8, 12, 12], atol=1e-5)

    dets = np.array([[0, 0, 10, 10, 0.9], [1, 1, 11, 11, 0.8], [50, 50, 60, 60, 0.7]])
    kept = nms(dets, 0.3)
    assert len(kept) == 2                      # overlapping pair collapsed

    sm = smooth_boxes(np.tile(np.array([[0, 0, 10, 10.0]]), (6, 1)))
    np.testing.assert_allclose(sm, np.tile(np.array([[0, 0, 10, 10.0]]), (6, 1)))


def test_spectre_code_split():
    se = SpectreEncoder()
    p = se.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    code = se.apply(p, jnp.zeros((1, 32, 32, 3)))
    assert code.shape == (1, TOTAL_DIM)
    d = split_deca_code(code)
    assert sum(v.shape[-1] for v in d.values()) == TOTAL_DIM


def test_adnerf_audio():
    an = AudioNet()
    p = an.init(jax.random.key(0), jnp.zeros((2, 16, 29)))
    assert an.apply(p, jnp.zeros((2, 16, 29))).shape == (2, 76)
    aa = AudioAttNet()
    pa = aa.init(jax.random.key(0), jnp.zeros((8, 76)))
    out = aa.apply(pa, jnp.ones((8, 76)))
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)  # convex avg


def test_lipreader_loss_gradient():
    m = VisualFrontend()
    x = jnp.zeros((1, 2, 48, 48, 1))
    p = m.init(jax.random.key(0), x)
    rng = np.random.default_rng(0)
    gen = jnp.asarray(rng.uniform(0, 1, (2, 48, 48, 3)).astype(np.float32))
    gt = jnp.asarray(rng.uniform(0, 1, (2, 48, 48, 3)).astype(np.float32))
    l, g = jax.value_and_grad(lambda im: lipread_loss(p, im, gt))(gen)
    assert np.isfinite(float(l))
    assert np.isfinite(np.asarray(g)).all()


def test_audio2pose_cvae_loss_descends():
    import optax

    # seq_len 8 = the faithful 2D ResUnet's minimum (3 stride-2 levels)
    m = Audio2PoseCVAE(seq_len=8, decoder_sizes=(128, 48))
    rng = np.random.default_rng(0)
    pm = jnp.asarray(rng.standard_normal((2, 8, 6)).astype(np.float32) * 0.1)
    ref = jnp.zeros((2, 6))
    ae = jnp.asarray(rng.standard_normal((2, 8, 512)).astype(np.float32) * 0.1)
    cid = jnp.asarray([0, 1])
    p = m.init(jax.random.key(0), pm, ref, ae, cid, jax.random.key(1))
    opt = optax.adam(1e-3)
    st = opt.init(p)

    def loss_fn(params, key):
        out = m.apply(params, pm, ref, ae, cid, key)
        l, _ = cvae_loss(out["pose_motion_pred"], pm, out["mu"], out["logvar"],
                         kl_weight=0.01)
        return l

    l0 = float(loss_fn(p, jax.random.key(2)))
    for i in range(30):
        g = jax.grad(loss_fn)(p, jax.random.key(i + 3))
        up, st = opt.update(g, st, p)
        p = optax.apply_updates(p, up)
    assert float(loss_fn(p, jax.random.key(99))) < l0

    d = PoseSequenceDiscriminator()
    pd = d.init(jax.random.key(0), pm)
    # per-timestep logits, T//4 (discriminator.py:66-73 two downsamples)
    assert d.apply(pd, pm).shape == (2, 2)


def test_spectre_perceptual_expression_branch():
    """E_expression (PerceptualEncoder, lipsrc/models/encoders.py:8-63):
    temporal conv over the frame window, 53-dim head split into exp/jaw
    with ReLU on jaw-x, and the encode() override composition
    (lipspectre.py:141-156)."""
    from nerf3dtalker_tpu.models.spectre import (
        PerceptualExpressionEncoder,
        spectre_encode,
    )

    pe = PerceptualExpressionEncoder()
    seq = jnp.zeros((3, 32, 32, 3))
    variables = pe.init(jax.random.key(0), seq)
    exp, jaw = pe.apply(variables, seq)
    assert exp.shape == (3, 50) and jaw.shape == (3, 3)
    # jaw-x is rectified (encoders.py:61)
    rng = jax.random.normal(jax.random.key(1), (2, 3, 32, 32, 3))
    expv, jawv = pe.apply(variables, rng)        # video-batch layout
    assert expv.shape == (2, 3, 50) and jawv.shape == (2, 3, 3)
    assert float(jnp.min(jawv[..., 0])) >= 0.0

    se = SpectreEncoder()
    p = se.init(jax.random.key(2), jnp.zeros((3, 32, 32, 3)))
    code = se.apply(p, jnp.zeros((3, 32, 32, 3)))
    coded, deca_exp, deca_jaw = spectre_encode(code, exp, jaw)
    # exp and jaw overridden by the perceptual branch; originals returned
    np.testing.assert_array_equal(np.asarray(coded["exp"]), np.asarray(exp))
    np.testing.assert_array_equal(
        np.asarray(coded["pose"][..., 3:]), np.asarray(jaw)
    )
    assert deca_exp.shape == (3, 50) and deca_jaw.shape == (3, 3)
    # global rotation untouched
    np.testing.assert_array_equal(
        np.asarray(coded["pose"][..., :3]),
        np.asarray(split_deca_code(code)["pose"][..., :3]),
    )


def test_mouth_transform_stats():
    """CenterCrop(88) + Normalize(0.421, 0.165) — the LRS3 lipreader's
    input transform (lipread_loss.py:113-121)."""
    from nerf3dtalker_tpu.models.lipreader import mouth_transform

    crops = jnp.full((2, 96, 96, 1), 0.421)
    out = mouth_transform(crops)
    assert out.shape == (2, 88, 88, 1)
    np.testing.assert_allclose(np.asarray(out), 0.0, atol=1e-6)
    out2 = mouth_transform(jnp.full((1, 96, 96, 1), 0.421 + 0.165))
    np.testing.assert_allclose(np.asarray(out2), 1.0, rtol=1e-5)
