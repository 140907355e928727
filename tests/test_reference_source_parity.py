"""Source-level parity vs ACTUAL reference modules (beyond the NeRF core).

tests/test_reference_parity.py proves the HeadNeRF stack against
/root/reference's own source; this file extends that evidence to the
audio pathway, the VQ bottleneck, and the ArcFace mobile backbone:

  * SimpleWrapperV2 (s_audio2exp_models/networks.py:26-74)
  * VectorQuantizer (StandardizedSpace/models/lib/quantizer.py:14-91)
  * MobileFaceNet (s_face3d/models/arcface_torch/backbones/mobilefacenet.py)

Each test builds the reference torch module, randomizes its state_dict,
converts with utils/convert, and asserts the flax forward matches.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

REF = "/root/reference"


def _ref_import(modname):
    if REF not in sys.path:
        sys.path.insert(0, REF)
    if not hasattr(np, "VisibleDeprecationWarning"):   # numpy 2 removal
        np.VisibleDeprecationWarning = DeprecationWarning
    # the s_face3d.models package __init__ pulls in kornia (losses.py);
    # reuse the minimal filter2d shim from the NeRF-core parity test
    from tests.test_reference_parity import _install_kornia_shim

    _install_kornia_shim()
    # losses.py/networks.py also `from kornia.geometry import warp_affine`
    import types

    if "kornia.geometry" not in sys.modules:
        geom = types.ModuleType("kornia.geometry")
        geom.warp_affine = None  # imported but unused by the backbones
        sys.modules["kornia"].geometry = geom
        sys.modules["kornia.geometry"] = geom
    try:
        return __import__(modname, fromlist=["_"])
    except Exception as e:  # pragma: no cover - environment-dependent
        pytest.skip(f"reference module {modname} not importable: {e}")


def _randomize_state(m, seed=0, scale=0.1):
    """Fill every tensor in the module with random values (positive
    running_var) so parity is checked on non-degenerate weights. `scale`
    keeps activations bounded through deep unnormalized trunks."""
    g = torch.Generator().manual_seed(seed)
    sd = m.state_dict()
    for k, v in sd.items():
        if not v.is_floating_point():
            continue
        if "running_var" in k:
            sd[k] = torch.rand(v.shape, generator=g) + 0.5
        else:
            sd[k] = torch.randn(v.shape, generator=g) * scale
    m.load_state_dict(sd)
    return m


def test_simple_wrapper_v2_matches_reference_source():
    nets = _ref_import("s_audio2exp_models.networks")
    from nerf3dtalker_tpu.models.audio import SimpleWrapperV2
    from nerf3dtalker_tpu.utils.convert import convert_simple_wrapper_v2

    tm = _randomize_state(nets.SimpleWrapperV2(), seed=3).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, convert_simple_wrapper_v2(sd))

    rng = np.random.default_rng(0)
    mel = rng.standard_normal((2, 1, 80, 16)).astype(np.float32)
    ref = rng.standard_normal((2, 64)).astype(np.float32) * 0.1
    ratio = rng.uniform(0, 1, (2, 1)).astype(np.float32)

    with torch.no_grad():
        want = tm(torch.from_numpy(mel), torch.from_numpy(ref),
                  torch.from_numpy(ratio)).numpy().reshape(2, 64)

    got = SimpleWrapperV2().apply(
        variables, jnp.asarray(mel.transpose(0, 2, 3, 1)),
        jnp.asarray(ref), jnp.asarray(ratio),
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_vector_quantizer_matches_reference_source():
    qmod = _ref_import("StandardizedSpace.models.lib.quantizer")
    from nerf3dtalker_tpu.models.vq.quantizer import VectorQuantizer

    n_e, e_dim = 64, 16
    tq = qmod.VectorQuantizer(n_e, e_dim, beta=0.25)
    emb = np.asarray(tq.embedding.weight.detach().numpy())

    rng = np.random.default_rng(1)
    z = rng.standard_normal((2, 5, e_dim)).astype(np.float32) * 0.05

    with torch.no_grad():
        z_q_t, loss_t, (ppl_t, _, idx_t) = tq(torch.from_numpy(z))
    # reference permutes (0,2,1) on return (quantizer.py:67); undo it
    want_zq = z_q_t.permute(0, 2, 1).numpy()

    vq = VectorQuantizer(n_embed=n_e, embed_dim=e_dim, beta=0.25)
    res = vq.apply({"params": {"embedding": jnp.asarray(emb)}}, jnp.asarray(z))
    np.testing.assert_allclose(np.asarray(res.quantized), want_zq, rtol=1e-5,
                               atol=1e-6)
    np.testing.assert_allclose(float(res.loss), float(loss_t), rtol=1e-4)
    np.testing.assert_allclose(float(res.perplexity), float(ppl_t), rtol=1e-4)
    np.testing.assert_array_equal(
        np.asarray(res.indices).reshape(-1), idx_t.numpy().reshape(-1)
    )

    # codebook entry lookup (quantizer.py:78-91)
    ids = np.asarray(res.indices).reshape(-1)
    with torch.no_grad():
        want_e = tq.get_codebook_entry(torch.from_numpy(ids), None).numpy()
    got_e = vq.apply(
        {"params": {"embedding": jnp.asarray(emb)}}, jnp.asarray(ids),
        method=VectorQuantizer.codebook_entry,
    )
    np.testing.assert_allclose(np.asarray(got_e), want_e, rtol=1e-6)


def test_mobilefacenet_matches_reference_source():
    mbf = _ref_import("s_face3d.models.arcface_torch.backbones.mobilefacenet")
    from nerf3dtalker_tpu.models.resnets import MobileFaceNet
    from nerf3dtalker_tpu.utils.convert import convert_mobilefacenet

    tm = _randomize_state(mbf.get_mbf(fp16=False, num_features=512),
                          seed=7).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, convert_mobilefacenet(sd))

    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 112, 112)).astype(np.float32) * 0.2
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    got = MobileFaceNet().apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-3, atol=5e-4)


def test_wav2lip_matches_reference_source():
    wmod = _ref_import("wav_models.wav2lip")
    from nerf3dtalker_tpu.models.wav2lip import Wav2Lip
    from nerf3dtalker_tpu.utils.convert import convert_wav2lip

    tm = _randomize_state(wmod.Wav2Lip(), seed=11).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, convert_wav2lip(sd))

    rng = np.random.default_rng(4)
    mel = rng.standard_normal((2, 1, 80, 16)).astype(np.float32) * 0.1
    faces = rng.uniform(0, 1, (2, 6, 96, 96)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(mel), torch.from_numpy(faces)).numpy()

    got = Wav2Lip().apply(
        variables, jnp.asarray(mel.transpose(0, 2, 3, 1)),
        jnp.asarray(faces.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-3, atol=1e-4
    )


def test_syncnet_matches_reference_source():
    smod = _ref_import("wav_models.syncnet")
    from nerf3dtalker_tpu.models.wav2lip import SyncNetColor
    from nerf3dtalker_tpu.utils.convert import convert_syncnet

    tm = _randomize_state(smod.SyncNet_color(), seed=13).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, convert_syncnet(sd))

    rng = np.random.default_rng(5)
    mel = rng.standard_normal((2, 1, 80, 16)).astype(np.float32) * 0.1
    face = rng.uniform(0, 1, (2, 15, 48, 96)).astype(np.float32)
    with torch.no_grad():
        want_a, want_f = tm(torch.from_numpy(mel), torch.from_numpy(face))

    got_a, got_f = SyncNetColor().apply(
        variables, jnp.asarray(mel.transpose(0, 2, 3, 1)),
        jnp.asarray(face.transpose(0, 2, 3, 1)),
    )
    np.testing.assert_allclose(np.asarray(got_a), want_a.numpy(), rtol=1e-3,
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(got_f), want_f.numpy(), rtol=1e-3,
                               atol=1e-4)


def test_s3fd_matches_reference_source():
    smod = _ref_import("face_detection.detection.sfd.net_s3fd")
    from nerf3dtalker_tpu.models.s3fd import S3FD
    from nerf3dtalker_tpu.utils.convert import convert_s3fd

    # s3fd has no normalization layers: keep weights small so 16
    # conv layers do not blow past fp32 accumulation-order noise
    tm = _randomize_state(smod.s3fd(), seed=17, scale=0.02).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, convert_s3fd(sd))

    rng = np.random.default_rng(6)
    x = rng.uniform(-1, 1, (1, 3, 128, 128)).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in tm(torch.from_numpy(x))]

    heads = S3FD().apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    got = []
    for cls, reg in heads:
        got += [np.asarray(cls).transpose(0, 3, 1, 2),
                np.asarray(reg).transpose(0, 3, 1, 2)]
    assert len(got) == len(want) == 12
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, w, rtol=1e-3, atol=1e-4)


def test_iresnet18_matches_reference_source():
    imod = _ref_import("s_face3d.models.arcface_torch.backbones.iresnet")
    from nerf3dtalker_tpu.models.resnets import IResNet
    from nerf3dtalker_tpu.utils.convert import convert_iresnet

    tm = _randomize_state(imod.iresnet18(), seed=19, scale=0.05).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, convert_iresnet(sd))

    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 3, 112, 112)).astype(np.float32) * 0.2
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    got = IResNet(layers=(2, 2, 2, 2)).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-3, atol=5e-4)


def test_bisenet_matches_reference_source():
    import types

    # flat imports inside DataProcess + torchvision/model_zoo are
    # environment-only: stub them before import
    dp = REF + "/DataProcess"
    if dp not in sys.path:
        sys.path.insert(0, dp)
    if "torchvision" not in sys.modules:
        sys.modules["torchvision"] = types.ModuleType("torchvision")
    import torch.utils.model_zoo as modelzoo

    orig = modelzoo.load_url
    modelzoo.load_url = lambda *a, **k: {}   # zero egress: skip pretrained
    try:
        bmod = _ref_import("BiSeNet")
        tm = _randomize_state(bmod.BiSeNet(n_classes=19), seed=23).eval()
    finally:
        modelzoo.load_url = orig

    from nerf3dtalker_tpu.models.bisenet import BiSeNet
    from nerf3dtalker_tpu.utils.convert import convert_bisenet

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, convert_bisenet(sd))

    rng = np.random.default_rng(8)
    x = rng.uniform(-1, 1, (1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = [t.numpy() for t in tm(torch.from_numpy(x))]

    got = BiSeNet(n_classes=19).apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    for g, w in zip(got, want):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w, rtol=5e-3, atol=1e-4
        )


def test_recon_net_matches_reference_source():
    nmod = _ref_import("s_face3d.models.networks")
    from nerf3dtalker_tpu.models.resnets import ReconNet
    from nerf3dtalker_tpu.utils.convert import convert_recon_net

    tm = _randomize_state(
        nmod.define_net_recon("resnet50", use_last_fc=False, init_path=None),
        seed=29, scale=0.05,
    ).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, convert_recon_net(sd))

    rng = np.random.default_rng(9)
    x = rng.uniform(0, 1, (2, 3, 96, 96)).astype(np.float32)
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()

    got = ReconNet().apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)))
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-3, atol=5e-4)


def _import_talker_trainer():
    """Import the reference's top-level trainer module (which defines
    Audio2style/RNNModel, talker_trainer.py:408-473). Its import chain
    pulls in many environment-only packages; stub just enough of each —
    none of the stubbed symbols participate in the Audio2style math."""
    import types

    import numpy as _np

    if not hasattr(_np, "VisibleDeprecationWarning"):   # numpy 2 removal
        _np.VisibleDeprecationWarning = DeprecationWarning

    def stub(name, **attrs):
        m = sys.modules.get(name) or types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        parent, _, child = name.rpartition(".")
        if parent and parent in sys.modules:
            setattr(sys.modules[parent], child, m)
        return m

    _ref_import  # ensure kornia shim symbols exist
    from tests.test_reference_parity import _install_kornia_shim

    _install_kornia_shim()
    stub("kornia.geometry", warp_affine=None)
    stub("kornia.geometry.transform")
    stub("kornia.geometry.transform.imgwarp", warp_perspective=None,
         get_perspective_transform=None, warp_affine=None)
    stub("torchvision")
    stub("torchvision.models")
    stub("torchvision.transforms")
    stub("torchvision.transforms.functional")
    stub("face_alignment")
    stub("skimage")
    stub("skimage.metrics", structural_similarity=None)
    stub("skimage.io", imsave=None, imread=None)
    stub("skimage.transform")
    stub("lpips", LPIPS=None)
    stub("ignite")
    stub("ignite.metrics", SSIM=None)
    stub("facexlib")
    stub("facexlib.alignment", landmark_98_to_68=None)
    stub("facexlib.detection", init_detection_model=None)
    stub("facexlib.utils", load_file_from_url=None)
    stub("yacs")
    stub("yacs.config", CfgNode=type("CfgNode", (dict,), {}))
    stub("loguru", logger=None)
    stub("librosa")
    stub("librosa.filters")
    return _ref_import("talker_trainer")


def test_audio2style_matches_reference_source():
    tt = _import_talker_trainer()
    from nerf3dtalker_tpu.models.audio import Audio2Style
    from nerf3dtalker_tpu.utils.convert import convert_audio2style

    tm = _randomize_state(tt.Audio2style(), seed=31).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = {"params": jax.tree.map(jnp.asarray, convert_audio2style(sd))}

    rng = np.random.default_rng(10)
    mels = rng.standard_normal((5, 80, 16)).astype(np.float32) * 0.3
    with torch.no_grad():
        want = tm(torch.from_numpy(mels)).numpy()

    got = Audio2Style().apply(params, jnp.asarray(mels))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_headnerf_losses_match_reference_source():
    """The training objective itself (bg/head/nonhead masked MSEs and
    their sum, Utils/HeadNeRFLossUtils.py:124-236) computed by the
    reference's own HeadNeRFLossUtils vs train/losses.headnerf_losses.
    (The VGG term needs pretrained torchvision weights absent here; its
    structure is covered by models/perceptual.py's converter tests.)"""
    _import_talker_trainer()  # installs the stub chain Utils.* needs
    from Utils.HeadNeRFLossUtils import HeadNeRFLossUtils

    from nerf3dtalker_tpu.train.losses import headnerf_losses

    ref = HeadNeRFLossUtils(bg_type="white", use_vgg_loss=False)

    rng = np.random.default_rng(11)
    B, H, W = 2, 16, 16
    merge = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    bg = rng.uniform(0.8, 1.0, (B, H, W, 3)).astype(np.float32)
    gt = rng.uniform(0, 1, (B, H, W, 3)).astype(np.float32)
    mask = (rng.uniform(0, 1, (B, H, W, 1)) > 0.4).astype(np.float32)

    pred_dict = {"coarse_dict": {
        "merge_img": torch.from_numpy(merge.transpose(0, 3, 1, 2)),
        "bg_img": torch.from_numpy(bg.transpose(0, 3, 1, 2)),
    }}
    want = ref.calc_total_loss(
        None, None, pred_dict, torch.from_numpy(gt.transpose(0, 3, 1, 2)),
        torch.from_numpy(mask.transpose(0, 3, 1, 2)), None,
    )

    got = headnerf_losses(
        {"merge_img": jnp.asarray(merge), "bg_img": jnp.asarray(bg)},
        jnp.asarray(gt), jnp.asarray(mask), bg_value=1.0,
    )
    for ours, theirs in (("bg_loss", "bg_loss"), ("head_loss", "head_loss"),
                         ("nonhead_loss", "nonhaed_loss"),
                         ("total_loss", "total_loss")):
        np.testing.assert_allclose(
            float(got[ours]), float(want[theirs]), rtol=1e-5,
            err_msg=f"{ours} vs reference {theirs}",
        )


def test_rotation_d6_matches_reference_source():
    """Rotation algebra vs the reference's own Utils/D6_rotation.py:
    quat<->SO3, d6 rep, and the gaze_to_d6 driver conversion."""
    d6m = _ref_import("Utils.D6_rotation")
    from nerf3dtalker_tpu.utils.rotations import (
        d6_to_rmat, gaze_to_d6, quat_to_d6, quat_to_rmat,
    )

    rng = np.random.default_rng(12)
    q = rng.standard_normal(4)
    q = q / np.linalg.norm(q)

    # the reference flattens column-stacked ([R[:,0] R[:,1] R[:,2]],
    # D6_rotation.py:25-45): its 9-vector is our R in column-major order
    R_ref = np.asarray(d6m.quat_to_so3(q)).reshape(3, 3)
    R_got = np.asarray(quat_to_rmat(jnp.asarray(q)[None]))[0]
    np.testing.assert_allclose(R_got.T, R_ref, rtol=1e-5, atol=1e-6)

    d6_ref = np.asarray(d6m.quat_to_d6(q)).reshape(-1)
    d6_got = np.asarray(quat_to_d6(jnp.asarray(q)[None]))[0]
    np.testing.assert_allclose(d6_got, d6_ref, rtol=1e-5, atol=1e-6)

    # d6 -> SO3 round-trip through the reference's Gram-Schmidt
    # (same column-major layout on the reference side)
    R_from_d6_ref = np.asarray(d6m.d6_to_so3(d6_ref.reshape(1, 6)))
    R_from_d6_got = np.asarray(d6_to_rmat(jnp.asarray(d6_ref)[None]))[0]
    np.testing.assert_allclose(
        R_from_d6_got.T, R_from_d6_ref.reshape(3, 3),
        rtol=1e-5, atol=1e-6,
    )

    gaze = rng.uniform(-0.5, 0.5, 2).astype(np.float64)
    want = np.asarray(d6m.gaze_to_d6(gaze)).reshape(-1)
    got = np.asarray(gaze_to_d6(jnp.asarray(gaze.astype(np.float32))))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_fus_audio2style_matches_reference_source():
    """Style-fusion head vs the reference talker_trainer_disexp module
    (talker_trainer_disexp.py:471-501)."""
    _import_talker_trainer()  # same stub chain
    ttd = _ref_import("talker_trainer_disexp")
    from nerf3dtalker_tpu.models.audio import FusAudio2Style
    from nerf3dtalker_tpu.utils.convert import _dense

    tm = _randomize_state(ttd.fus_Audio2style(), seed=37).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = {"params": {
        "linear1": jax.tree.map(jnp.asarray, _dense(sd, "linear1.0")),
        "linear2": jax.tree.map(jnp.asarray, _dense(sd, "linear2.0")),
    }}

    rng = np.random.default_rng(13)
    f1 = rng.standard_normal((3, 64)).astype(np.float32) * 0.3
    f2 = rng.standard_normal((3, 64)).astype(np.float32) * 0.3
    with torch.no_grad():
        want = tm(torch.from_numpy(f1), torch.from_numpy(f2)).numpy()

    got = FusAudio2Style().apply(params, jnp.asarray(f1), jnp.asarray(f2))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_au_classifier_matches_reference_source():
    """The per-AU CNN whose linear2 features feed the AU codebook
    (StandardizedSpace/main/train_vq.py:60-93)."""
    import types

    ss = REF + "/StandardizedSpace"
    if ss not in sys.path:
        sys.path.insert(0, ss)
    sys.modules.setdefault("loss", types.ModuleType("loss"))  # main/loss dep
    tv = _ref_import("main.train_vq")
    from nerf3dtalker_tpu.models.vq.au_classifier import AUClassifier
    from nerf3dtalker_tpu.utils.convert import convert_au_classifier

    tm = _randomize_state(tv.classifier_AU(), seed=41).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, convert_au_classifier(sd))

    rng = np.random.default_rng(14)
    x = rng.uniform(0, 1, (2, 3, 112, 112)).astype(np.float32)
    with torch.no_grad():
        want_f, want_p = tm(torch.from_numpy(x))

    got_f, got_p = AUClassifier().apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got_f), want_f.numpy(), rtol=2e-3,
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(got_p), want_p.numpy(), rtol=2e-3,
                               atol=2e-4)


def test_stage2_mask_and_ppe_match_reference_source():
    """CodeTalker machinery vs StandardizedSpace/models/utils.py: the
    ALiBi-style biased causal mask, the enc-dec alignment mask, and the
    periodic positional encoding table."""
    ss = REF + "/StandardizedSpace"
    if ss not in sys.path:
        sys.path.insert(0, ss)
    um = _ref_import("models.utils")
    from nerf3dtalker_tpu.models.vq.stage2 import (
        enc_dec_mask, init_biased_mask, periodic_positional_encoding,
    )

    H, T, period = 4, 12, 3
    want = um.init_biased_mask(H, T, period).numpy()
    got = np.asarray(init_biased_mask(H, T, period))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # enc_dec_mask: reference returns True where attention is BLOCKED
    for ds, S in (("vocaset", 12), ("BIWI", 24)):
        want_blocked = um.enc_dec_mask("cpu", ds, T, S).numpy()
        got_bias = np.asarray(enc_dec_mask(T, S, dataset=ds))
        np.testing.assert_array_equal(np.isneginf(got_bias), want_blocked)

    ppe_ref = um.PeriodicPositionalEncoding(32, dropout=0.0, period=7,
                                            max_seq_len=40).eval()
    x = torch.zeros(1, 40, 32)
    with torch.no_grad():
        want_pe = ppe_ref(x).numpy()[0]
    got_pe = np.asarray(
        periodic_positional_encoding(jnp.zeros((1, 40, 32)), period=7)
    )[0]
    np.testing.assert_allclose(got_pe, want_pe, rtol=1e-5, atol=1e-6)


def test_flame_lbs_matches_reference_source():
    """FLAME linear-blend-skinning math vs the reference's own
    lipsrc/models/lbs.py on random synthetic model tensors."""
    lbs_ref = _ref_import("lipsrc.models.lbs")
    from nerf3dtalker_tpu.models.flame import (
        batch_rodrigues, blend_shapes, lbs, vertices2landmarks,
    )

    rng = np.random.default_rng(15)
    rv = rng.standard_normal((4, 3)).astype(np.float32) * 0.5
    want_R = lbs_ref.batch_rodrigues(torch.from_numpy(rv)).numpy()
    got_R = np.asarray(batch_rodrigues(jnp.asarray(rv)))
    np.testing.assert_allclose(got_R, want_R, rtol=1e-5, atol=1e-6)

    B, V, nB = 2, 20, 8
    betas = rng.standard_normal((B, nB)).astype(np.float32)
    disps = rng.standard_normal((V, 3, nB)).astype(np.float32) * 0.01
    want_bs = lbs_ref.blend_shapes(torch.from_numpy(betas),
                                   torch.from_numpy(disps)).numpy()
    got_bs = np.asarray(blend_shapes(jnp.asarray(betas), jnp.asarray(disps)))
    np.testing.assert_allclose(got_bs, want_bs, rtol=1e-5, atol=1e-6)

    # full LBS: tiny synthetic rig (5 joints, chain parents)
    J = 5
    v_template = rng.standard_normal((V, 3)).astype(np.float32) * 0.1
    shapedirs = disps
    posedirs = rng.standard_normal(((J - 1) * 9, V * 3)).astype(np.float32) * 0.001
    J_reg = rng.uniform(0, 1, (J, V)).astype(np.float32)
    J_reg /= J_reg.sum(1, keepdims=True)
    parents = np.array([-1, 0, 1, 1, 2], np.int64)
    weights = rng.uniform(0, 1, (V, J)).astype(np.float32)
    weights /= weights.sum(1, keepdims=True)
    pose = rng.standard_normal((B, J * 3)).astype(np.float32) * 0.2

    want_v, want_j = lbs_ref.lbs(
        torch.from_numpy(betas), torch.from_numpy(pose),
        torch.from_numpy(v_template)[None].expand(B, -1, -1),
        torch.from_numpy(shapedirs),
        torch.from_numpy(posedirs),
        torch.from_numpy(J_reg), torch.from_numpy(parents),
        torch.from_numpy(weights),
    )
    got_v, got_j = lbs(
        jnp.asarray(betas), jnp.asarray(pose), jnp.asarray(v_template),
        jnp.asarray(shapedirs), jnp.asarray(posedirs), jnp.asarray(J_reg),
        jnp.asarray(parents), jnp.asarray(weights),
    )
    np.testing.assert_allclose(np.asarray(got_v), want_v.numpy(), rtol=1e-4,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_j), want_j.numpy(), rtol=1e-4,
                               atol=1e-5)

    # landmark extraction by barycentric face lookup
    faces = rng.integers(0, V, (12, 3)).astype(np.int64)
    lmk_f = rng.integers(0, 12, (7,)).astype(np.int64)
    bary = rng.uniform(0, 1, (7, 3)).astype(np.float32)
    bary /= bary.sum(1, keepdims=True)
    want_lmk = lbs_ref.vertices2landmarks(
        want_v, torch.from_numpy(faces),
        torch.from_numpy(lmk_f)[None].repeat(B, 1),
        torch.from_numpy(bary)[None].repeat(B, 1, 1),
    ).numpy()
    got_lmk = np.asarray(vertices2landmarks(
        jnp.asarray(np.asarray(got_v)), jnp.asarray(faces),
        jnp.asarray(lmk_f), jnp.asarray(bary),
    ))
    np.testing.assert_allclose(got_lmk, want_lmk, rtol=1e-4, atol=1e-5)


def test_lve_fdd_match_reference_recipe():
    """LVE/FDD vs the reference's exact numpy recipe
    (StandardizedSpace/main/cal_metric.py:41-77, not importable as
    functions — the script is one monolithic main())."""
    from nerf3dtalker_tpu.utils.mesh_metrics import fdd, lip_vertex_error

    rng = np.random.default_rng(16)
    T, V = 6, 30
    gt = rng.standard_normal((T, V, 3)).astype(np.float64)
    pred = gt + rng.standard_normal((T, V, 3)) * 0.05
    template = rng.standard_normal((V, 3))
    mouth = [1, 4, 7, 9]
    upper = [0, 2, 5, 11, 20]

    # ---- reference recipe, transcribed verbatim ----
    L2 = np.array([np.square(gt[:, v, :] - pred[:, v, :]) for v in mouth])
    L2 = np.transpose(L2, (1, 0, 2)).sum(axis=2).max(axis=1)
    lve_ref = np.mean(L2)

    def motion_std(verts):
        motion = verts - template.reshape(1, V, 3)
        d = np.array([np.square(motion[:, v, :]) for v in upper])
        d = np.transpose(d, (1, 0, 2)).sum(axis=2)
        return np.mean(np.std(d, axis=0))

    fdd_ref = motion_std(gt) - motion_std(pred)

    np.testing.assert_allclose(lip_vertex_error(gt, pred, mouth), lve_ref,
                               rtol=1e-12)
    np.testing.assert_allclose(fdd(gt, pred, template, upper), fdd_ref,
                               rtol=1e-9)


def test_extract_5p_matches_reference_source():
    """Face-alignment landmark reduction (extract_5p) vs
    s_face3d/util/preprocess.py. (The reference's POS scale/translation
    solve is replaced by umeyama similarity in data/align.py — a
    deliberate redesign, covered by its own tests.)"""
    import types

    sys.modules.setdefault("skimage", types.ModuleType("skimage"))
    sys.modules.setdefault("skimage.transform",
                           types.ModuleType("skimage.transform"))
    sys.modules["skimage"].transform = sys.modules["skimage.transform"]
    pp = _ref_import("s_face3d.util.preprocess")
    from nerf3dtalker_tpu.data.align import landmarks68_to_5

    rng = np.random.default_rng(17)
    lm68 = rng.uniform(0, 224, (68, 2))
    want = pp.extract_5p(lm68)
    got = landmarks68_to_5(lm68)
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=1e-5)


def test_spectre_encoders_match_reference_source():
    """SPECTRE's two encoders vs the reference's own modules
    (lipsrc/models/encoders.py): E_flame (ResnetEncoder resnet50 +
    1024-ReLU-236 head) and E_expression (PerceptualEncoder resnet50
    variant: temporal Conv1d k5 + BN1d + ReLU -> Linear(256,53), jaw-x
    ReLU) on converted random weights."""
    import types

    if "torchvision" not in sys.modules:   # resnet.py top-level import
        sys.modules["torchvision"] = types.ModuleType("torchvision")
    rmod = _ref_import("lipsrc.models.resnet")
    # zero egress: bypass the torchvision-pretrained copy
    rmod.load_ResNet50Model = lambda: rmod.ResNet(rmod.Bottleneck, [3, 4, 6, 3])
    emod = _ref_import("lipsrc.models.encoders")

    from nerf3dtalker_tpu.models.spectre import (
        TOTAL_DIM,
        PerceptualExpressionEncoder,
        SpectreEncoder,
    )
    from nerf3dtalker_tpu.utils.convert import (
        convert_spectre_flame_encoder,
        convert_spectre_perceptual_encoder,
    )

    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 3, 224, 224)).astype(np.float32) * 0.2

    # ---- E_flame ----------------------------------------------------------
    tm = _randomize_state(emod.ResnetEncoder(outsize=TOTAL_DIM),
                          seed=23, scale=0.05).eval()
    with torch.no_grad():
        want = tm(torch.from_numpy(x)).numpy()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, convert_spectre_flame_encoder(sd))
    got = SpectreEncoder().apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=5e-3, atol=5e-4)

    # ---- E_expression -----------------------------------------------------
    cfg = types.SimpleNamespace(backbone="resnet50")
    pm = _randomize_state(emod.PerceptualEncoder(50, cfg),
                          seed=29, scale=0.05).eval()
    with torch.no_grad():
        want_exp, want_jaw = pm(torch.from_numpy(x))
        want_exp, want_jaw = want_exp.numpy(), want_jaw.numpy()
    sd = {k: v.detach().numpy() for k, v in pm.state_dict().items()}
    variables = jax.tree.map(
        jnp.asarray, convert_spectre_perceptual_encoder(sd)
    )
    got_exp, got_jaw = PerceptualExpressionEncoder().apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 1))
    )
    np.testing.assert_allclose(np.asarray(got_exp), want_exp,
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(np.asarray(got_jaw), want_jaw,
                               rtol=5e-3, atol=5e-4)
    assert float(np.min(np.asarray(got_jaw)[..., 0])) >= 0.0


def test_audio2pose_cvae_matches_reference_source():
    """Audio2Pose CVAE vs the reference's own modules
    (s_audio2pose_models/cvae.py ENCODER/DECODER with the 2D ResUnet pose
    embedder, res_unet.py + networks.py) on converted random weights —
    including the reference's logvar-from-linear_means quirk
    (cvae.py:95-96). Also the PoseSequenceDiscriminator
    (discriminator.py:59-75)."""
    import types

    cmod = _ref_import("s_audio2pose_models.cvae")
    dmod = _ref_import("s_audio2pose_models.discriminator")

    from nerf3dtalker_tpu.models.audio2pose import (
        Audio2PoseCVAE,
        PoseSequenceDiscriminator,
    )
    from nerf3dtalker_tpu.utils.convert import (
        convert_audio2pose_cvae,
        convert_pose_discriminator,
    )

    def ns(**kw):
        return types.SimpleNamespace(**kw)

    cfg = ns(
        MODEL=ns(
            CVAE=ns(
                ENCODER_LAYER_SIZES=[192, 128],
                DECODER_LAYER_SIZES=[128, 192],
                LATENT_SIZE=64, AUDIO_EMB_IN_SIZE=512,
                AUDIO_EMB_OUT_SIZE=6, SEQ_LEN=32,
            ),
            DISCRIMINATOR=ns(LEAKY_RELU=True, INPUT_CHANNELS=6),
        ),
        DATASET=ns(NUM_CLASSES=46),
    )
    tm = _randomize_state(cmod.CVAE(cfg), seed=31, scale=0.05).eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = jax.tree.map(jnp.asarray, convert_audio2pose_cvae(sd))

    rng = np.random.default_rng(13)
    B, T = 2, 32
    pose = rng.standard_normal((B, T, 6)).astype(np.float32) * 0.3
    ref = rng.standard_normal((B, 6)).astype(np.float32) * 0.3
    audio = rng.standard_normal((B, T, 512)).astype(np.float32) * 0.3
    cls = np.array([3, 41])
    z = rng.standard_normal((B, 64)).astype(np.float32) * 0.5

    batch = {
        "pose_motion_gt": torch.from_numpy(pose),
        "ref": torch.from_numpy(ref),
        "audio_emb": torch.from_numpy(audio),
        "class": torch.from_numpy(cls),
        "z": torch.from_numpy(z),
    }
    with torch.no_grad():
        enc = tm.encoder({**batch})
        want_mu, want_logvar = enc["mu"].numpy(), enc["logvar"].numpy()
        dec = tm.decoder({**batch})
        want_pose = dec["pose_motion_pred"].numpy()

    m = Audio2PoseCVAE()
    got_mu, got_logvar = m.apply(
        variables, jnp.asarray(pose), jnp.asarray(ref), jnp.asarray(audio),
        jnp.asarray(cls), method=lambda mdl, *a: mdl.encoder(*a),
    )
    np.testing.assert_allclose(np.asarray(got_mu), want_mu,
                               rtol=5e-3, atol=5e-4)
    # the reference quirk: logvar IS mu (cvae.py:95-96)
    np.testing.assert_allclose(np.asarray(got_logvar), want_logvar,
                               rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(want_logvar, want_mu)

    got_pose = m.apply(
        variables, jnp.asarray(z), jnp.asarray(ref), jnp.asarray(audio),
        jnp.asarray(cls), method=Audio2PoseCVAE.decode,
    )
    np.testing.assert_allclose(np.asarray(got_pose), want_pose,
                               rtol=5e-3, atol=5e-4)

    # ---- discriminator ----------------------------------------------------
    td = _randomize_state(
        dmod.PoseSequenceDiscriminator(cfg), seed=37, scale=0.05
    ).eval()
    sdd = {k: v.detach().numpy() for k, v in td.state_dict().items()}
    dvars = jax.tree.map(jnp.asarray, convert_pose_discriminator(sdd))
    seq = rng.standard_normal((B, T, 6)).astype(np.float32) * 0.3
    with torch.no_grad():
        want_d = td(torch.from_numpy(seq[:, :, None, :])).numpy()
    got_d = PoseSequenceDiscriminator().apply(dvars, jnp.asarray(seq))
    np.testing.assert_allclose(np.asarray(got_d), want_d,
                               rtol=5e-3, atol=5e-4)
