"""GFPGAN-v1-clean restorer: forward shapes, SFT conditioning effect,
and the published-key-name state_dict converter (shape-level validation —
the gfpgan package/checkpoints are unavailable in-image, see the module
docstring caveat). Reference slot: s_utils/face_enhancer.py:26-123."""

import math

import jax
import jax.numpy as jnp
import numpy as np

from nerf3dtalker_tpu.models.gfpgan import (
    GFPGANClean,
    convert_gfpgan_clean,
    restore_faces,
)

OUT = 64


def _model_and_params():
    m = GFPGANClean(out_size=OUT)
    x = jnp.zeros((1, OUT, OUT, 3))
    return m, m.init(jax.random.key(0), x)


def test_forward_shapes_and_restore():
    m, p = _model_and_params()
    x = jnp.asarray(
        np.random.default_rng(0).uniform(-1, 1, (2, OUT, OUT, 3))
        .astype(np.float32)
    )
    y = m.apply(p, x)
    assert y.shape == (2, OUT, OUT, 3)
    assert np.isfinite(np.asarray(y)).all()
    frames = np.random.default_rng(1).uniform(0, 1, (3, OUT, OUT, 3)).astype(
        np.float32
    )
    out = restore_faces(p, frames, model=m, batch=2)
    assert out.shape == frames.shape
    assert out.min() >= 0.0 and out.max() <= 1.0


def test_input_changes_output():
    """The restorer is input-conditioned end-to-end (latents AND SFT maps
    come from the degraded image), not a fixed generator."""
    m, p = _model_and_params()
    a = m.apply(p, jnp.zeros((1, OUT, OUT, 3)))
    b = m.apply(p, jnp.ones((1, OUT, OUT, 3)) * 0.5)
    assert float(jnp.max(jnp.abs(a - b))) > 1e-6


def _synthetic_state_dict(params):
    """Invert the converter's mapping on a real init tree to produce a
    torch-layout state_dict with the PUBLISHED key names/shapes."""
    sd = {}
    p = params["params"]

    def put_conv(name, leaf):
        sd[f"{name}.weight"] = np.asarray(leaf["kernel"]).transpose(3, 2, 0, 1)
        if "bias" in leaf:
            sd[f"{name}.bias"] = np.asarray(leaf["bias"])

    put_conv("conv_body_first", p["conv_body_first"])
    put_conv("final_conv", p["final_conv"])
    sd["final_linear.weight"] = np.asarray(p["final_linear"]["kernel"]).T
    sd["final_linear.bias"] = np.asarray(p["final_linear"]["bias"])
    log_size = int(math.log2(OUT))
    for i in range(log_size - 2):
        for blk in ("conv_body_down", "conv_body_up"):
            for c in ("conv1", "conv2", "skip"):
                put_conv(f"{blk}.{i}.{c}", p[f"{blk}_{i}"][c])
        put_conv(f"condition_scale.{i}.0", p[f"condition_scale_{i}_0"])
        put_conv(f"condition_scale.{i}.2", p[f"condition_scale_{i}_1"])
        put_conv(f"condition_shift.{i}.0", p[f"condition_shift_{i}_0"])
        put_conv(f"condition_shift.{i}.2", p[f"condition_shift_{i}_1"])

    d = p["stylegan_decoder"]
    sd["stylegan_decoder.constant_input.weight"] = np.asarray(
        d["constant_input"]
    ).transpose(0, 3, 1, 2)

    def put_mod(name, leaf, with_noise):
        # published layout: modulated conv NESTED under
        # '{name}.modulated_conv.*'; StyleConv's noise strength is
        # '{name}.weight' [1]; activation bias '{name}.bias' [1,C,1,1]
        mc = leaf["modulated_conv"]
        w = np.asarray(mc["weight"])                      # [k, k, in, out]
        k, cin = w.shape[0], w.shape[2]
        sd[f"{name}.modulated_conv.weight"] = (
            w / math.sqrt(cin * k * k)
        ).transpose(3, 2, 0, 1)[None]
        sd[f"{name}.modulated_conv.modulation.weight"] = np.asarray(
            mc["modulation"]["kernel"]
        ).T
        sd[f"{name}.modulated_conv.modulation.bias"] = np.asarray(
            mc["modulation"]["bias"]
        )
        sd[f"{name}.bias"] = np.asarray(leaf["bias"]).reshape(1, 1, 1, -1)
        if with_noise:
            sd[f"{name}.weight"] = np.asarray(
                leaf["noise_weight"]
            ).reshape(1)

    put_mod("stylegan_decoder.style_conv1", d["style_conv1"], True)
    put_mod("stylegan_decoder.to_rgb1", d["to_rgb1"], False)
    for i in range(2 * (log_size - 2)):
        put_mod(f"stylegan_decoder.style_convs.{i}", d[f"style_convs_{i}"], True)
    for i in range(log_size - 2):
        put_mod(f"stylegan_decoder.to_rgbs.{i}", d[f"to_rgbs_{i}"], False)
    for i in range(2 * (log_size - 2) + 1):
        sd[f"stylegan_decoder.noises.noise_{i}"] = np.asarray(
            d[f"noise_{i}"]
        ).transpose(0, 3, 1, 2)
    return sd


def test_state_dict_converter_roundtrip():
    m, p = _model_and_params()
    sd = _synthetic_state_dict(p)
    conv = convert_gfpgan_clean(sd, out_size=OUT)
    # identical tree structure AND values (the mapping is lossless)
    ref_leaves = jax.tree_util.tree_leaves_with_path(p)
    got = dict(
        (jax.tree_util.keystr(k), v)
        for k, v in jax.tree_util.tree_leaves_with_path(conv)
    )
    assert len(got) == len(ref_leaves)
    for k, v in ref_leaves:
        ks = jax.tree_util.keystr(k)
        assert ks in got, f"missing {ks}"
        np.testing.assert_allclose(
            np.asarray(got[ks]), np.asarray(v), rtol=1e-5, atol=1e-6,
            err_msg=ks,
        )
    x = jnp.zeros((1, OUT, OUT, 3))
    np.testing.assert_allclose(
        np.asarray(m.apply(conv, x)), np.asarray(m.apply(p, x)),
        rtol=1e-4, atol=1e-5,
    )


def test_gfpgan_enhancer_slot():
    """enhance_frames composes with the gfpgan-backed enhancer factory
    (face_enhancer.enhancer_list interface)."""
    from nerf3dtalker_tpu.utils.video import enhance_frames, gfpgan_enhancer

    m, p = _model_and_params()
    frames = np.random.default_rng(2).uniform(0, 1, (2, OUT, OUT, 3)).astype(
        np.float32
    )
    out = enhance_frames(frames, gfpgan_enhancer(p, model=m))
    assert out.shape == frames.shape and np.isfinite(out).all()


def test_stored_noise_buffers_are_effective():
    """randomize_noise=False semantics: converted `noises.noise_{i}`
    buffers, scaled by a nonzero learned noise strength, must change the
    restorer output (the r4 structural gap — zero noise always)."""
    m, p = _model_and_params()
    sd = _synthetic_state_dict(p)
    rng = np.random.default_rng(3)
    log_size = int(math.log2(OUT))
    for i in range(2 * (log_size - 2) + 1):
        r = 4 * 2 ** ((i + 1) // 2)
        sd[f"stylegan_decoder.noises.noise_{i}"] = rng.standard_normal(
            (1, 1, r, r)
        ).astype(np.float32)
        # give the noise a path into the activations
        name = ("stylegan_decoder.style_conv1" if i == 0
                else f"stylegan_decoder.style_convs.{i-1}")
        sd[f"{name}.weight"] = np.ones(1, np.float32) * 0.1
    conv = convert_gfpgan_clean(sd, out_size=OUT)
    sd0 = dict(sd)
    for i in range(2 * (log_size - 2) + 1):
        sd0[f"stylegan_decoder.noises.noise_{i}"] = np.zeros_like(
            sd0[f"stylegan_decoder.noises.noise_{i}"]
        )
    conv0 = convert_gfpgan_clean(sd0, out_size=OUT)
    x = jnp.asarray(rng.uniform(-1, 1, (1, OUT, OUT, 3)).astype(np.float32))
    a, b = m.apply(conv, x), m.apply(conv0, x)
    assert float(jnp.max(jnp.abs(a - b))) > 1e-4
