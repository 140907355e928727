"""Gap-fill components: ingestion, misc models, stage-2 trainer,
crop-and-extract, mesh-sequence rendering."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf3dtalker_tpu.config import VQConfig
from nerf3dtalker_tpu.data.crop_extract import crop_and_extract, extract_exp_sequence
from nerf3dtalker_tpu.data.ingest import (
    AU_CSV_COLUMNS,
    parse_openface_au_csv,
    parse_xgaze_camera_xml,
)
from nerf3dtalker_tpu.models.misc import (
    ExpressionLossNet,
    LandmarkEstimator,
    draw_side_by_side,
    expression_loss,
    gan_loss,
    get_model,
)
from nerf3dtalker_tpu.train.stage2_trainer import build_stage2_step


def test_openface_csv(tmp_path):
    ncols = max(AU_CSV_COLUMNS.values()) + 2
    rows = []
    for t in range(3):
        vals = ["0"] * ncols
        for i, c in enumerate(AU_CSV_COLUMNS.values()):
            vals[c] = str(t + 0.1 * i)
        rows.append(",".join(vals))
    p = tmp_path / "au.csv"
    p.write_text("header\n" + "\n".join(rows) + "\n")
    au = parse_openface_au_csv(str(p))
    assert au.shape == (3, 5)
    np.testing.assert_allclose(au[1, 0], 1.0)
    np.testing.assert_allclose(au[2, 4], 2.4)


def test_xgaze_xml(tmp_path):
    xml = """<?xml version="1.0"?>
<opencv_storage>
<Camera_Matrix type_id="opencv-matrix"><rows>3</rows><cols>3</cols>
<dt>d</dt><data>100 0 50 0 100 50 0 0 1</data></Camera_Matrix>
<cam_translation type_id="opencv-matrix"><rows>3</rows><cols>1</cols>
<dt>d</dt><data>1 2 3</data></cam_translation>
</opencv_storage>"""
    p = tmp_path / "cam00.xml"
    p.write_text(xml)
    d = parse_xgaze_camera_xml(str(p))
    assert d["camera_matrix"].shape == (3, 3)
    assert d["camera_matrix"][0, 0] == 100
    np.testing.assert_allclose(d["cam_translation"][:, 0], [1, 2, 3])


def test_misc_models():
    le = LandmarkEstimator()
    p = le.init(jax.random.key(0), jnp.zeros((2, 64, 64, 1)))
    lm = le.apply(p, jnp.zeros((2, 64, 64, 1)))
    assert lm.shape == (2, 68, 2)

    en = ExpressionLossNet()
    pe = en.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    feat, logits = en.apply(pe, jnp.zeros((1, 32, 32, 3)))
    assert feat.shape == (1, 256) and logits.shape == (1, 8)
    gen = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (1, 32, 32, 3)).astype(np.float32))
    l = expression_loss(pe, en, gen, gen)
    assert float(l) < 1e-6

    assert float(gan_loss(jnp.ones((4, 1)), True)) < 1e-6
    assert float(gan_loss(jnp.zeros((4, 1)), False)) < 1e-6
    assert float(gan_loss(jnp.zeros((4, 1)), True, "vanilla")) > 0

    m = get_model("audio2style")
    assert m is not None
    try:
        get_model("nope")
        assert False
    except ValueError:
        pass

    strip = draw_side_by_side(np.zeros((8, 8, 3)), np.ones((8, 8, 3)))
    assert strip.shape == (8, 16, 3) and strip.dtype == np.uint8


def test_stage2_trainer_descends():
    cfg = VQConfig(embed_dim=8, face_quan_num=2, n_embed=16)
    V3 = 12
    L = None

    # toy frozen "stage-1": linear codebook roundtrip
    W = jnp.asarray(np.random.default_rng(0).standard_normal((V3, 2 * 8)).astype(np.float32) * 0.1)

    def get_gt_quant(motion):     # [B,T,V3] -> [B,T*2,8]
        z = motion @ W
        return z.reshape(motion.shape[0], -1, 8)

    def quantize(codes):
        return codes, None        # identity "quantizer" for the toy test

    def decode(quant):            # [B,T*2,8] -> [B,T,V3]
        B = quant.shape[0]
        z = quant.reshape(B, -1, 16)
        return z @ W.T / (W.shape[1] / 16)

    vq_apply = {"get_gt_quant": get_gt_quant, "quantize": quantize, "decode": decode}
    init, step, predict = build_stage2_step(cfg, vq_apply, vertice_dim=V3,
                                            lr=1e-3, feature_dim=16,
                                            n_subjects=2)
    rng = np.random.default_rng(1)
    batch = {
        "audio_feats": jnp.asarray(rng.standard_normal((1, 20, 768)).astype(np.float32)),
        "motion": jnp.asarray(rng.standard_normal((1, 6, V3)).astype(np.float32) * 0.1),
        "onehot": jax.nn.one_hot(jnp.asarray([0]), 2),
    }
    state = init(jax.random.key(0), batch)
    state, m0 = step(state, batch)
    for _ in range(15):
        state, m = step(state, batch)
    assert float(m["total_loss"]) < float(m0["total_loss"])

    # autoregressive predict: fixed-shape loop, finite, and causal — frame t
    # must not depend on buffer contents at frames >= t (checked by the
    # fixed-point property: teacher-forcing on the prediction reproduces it)
    import numpy as _np
    out = predict(state.params, batch["audio_feats"], batch["onehot"], 6)
    assert out.shape == (1, 6, V3) and _np.isfinite(_np.asarray(out)).all()
    from nerf3dtalker_tpu.models.vq.stage2 import CodeTalker
    model = CodeTalker(cfg, feature_dim=16, n_subjects=2, vertice_dim=V3)
    codes = model.apply(state.params, batch["audio_feats"], out, batch["onehot"])
    recon = vq_apply["decode"](vq_apply["quantize"](codes)[0])
    _np.testing.assert_allclose(
        _np.asarray(recon), _np.asarray(out), rtol=2e-4, atol=2e-5)


def test_crop_and_extract():
    rng = np.random.default_rng(0)
    img = rng.uniform(0, 1, (64, 64, 3)).astype(np.float32)
    lm = rng.uniform(10, 54, (68, 2)).astype(np.float32)

    def recon_apply(x):
        assert x.shape == (1, 224, 224, 3)
        return np.arange(257, dtype=np.float32)[None]

    d = crop_and_extract(img, recon_apply, landmarks=lm)
    assert d["exp"].shape == (64,)
    assert d["exp"][0] == 80.0

    seq = extract_exp_sequence(
        np.stack([img, img]), recon_apply, landmarks=np.stack([lm, lm])
    )
    assert seq.shape == (2, 64)
