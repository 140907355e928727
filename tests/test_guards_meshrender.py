"""Guards (NaN skip) and mesh-sequence rendering tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nerf3dtalker_tpu.utils.guards import StepGuard, guarded_update, tree_isfinite
from nerf3dtalker_tpu.utils.mesh_render import render_mesh_sequence


def test_tree_isfinite():
    assert bool(tree_isfinite({"a": jnp.ones(3), "b": jnp.zeros(2)}))
    assert not bool(tree_isfinite({"a": jnp.asarray([1.0, jnp.nan])}))
    assert not bool(tree_isfinite({"a": jnp.asarray([jnp.inf])}))
    assert bool(tree_isfinite({"ints": jnp.arange(3)}))  # ints ignored


def test_guarded_update_skips_bad():
    p = {"w": jnp.ones(3)}
    new = {"w": jnp.zeros(3)}
    good = {"w": jnp.ones(3)}
    bad = {"w": jnp.asarray([1.0, jnp.nan, 1.0])}
    out, ok = guarded_update(p, new, good)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(out["w"]), 0.0)
    out, ok = guarded_update(p, new, bad)
    assert not bool(ok)
    np.testing.assert_allclose(np.asarray(out["w"]), 1.0)


def test_step_guard_raises_after_run():
    g = StepGuard(max_bad=3, policy="abort")
    assert g.check(True, 0)
    assert not g.check(False, 1)
    assert not g.check(False, 2)
    with pytest.raises(FloatingPointError):
        g.check(False, 3)
    # recovery resets the run
    g2 = StepGuard(max_bad=3, policy="abort")
    g2.check(False, 0)
    g2.check(True, 1)
    assert g2.bad_run == 0


def test_step_guard_epoch_policies():
    # warn: reports but keeps going
    g = StepGuard(policy="warn")
    assert g.epoch_check(0, 10, epoch=0) == "ok"
    assert g.epoch_check(2, 10, epoch=1) == "warn"
    assert g.total_bad == 2
    # rollback: asks the caller to restore, then resets the run
    g = StepGuard(policy="rollback")
    assert g.epoch_check(1, 10, epoch=0) == "rollback"
    assert g.rollbacks == 1
    assert g.bad_run == 0
    # abort: raises once the cumulative run reaches max_bad
    g = StepGuard(max_bad=3, policy="abort")
    assert g.epoch_check(2, 10, epoch=0) == "warn"
    with pytest.raises(FloatingPointError):
        g.epoch_check(1, 10, epoch=1)
    with pytest.raises(ValueError):
        StepGuard(policy="explode")


def test_train_step_reports_finite_flag():
    from nerf3dtalker_tpu.config import NeRFConfig, TrainConfig
    from nerf3dtalker_tpu.train.step import build_step_fns
    from nerf3dtalker_tpu.utils.camera import base_cam, ray_grid

    cfg = NeRFConfig(featmap_size=8, featmap_nc=32, pred_img_size=32,
                     num_sample_coarse=8, mlp_hidden=32)
    fns = build_step_fns(cfg, TrainConfig(bf16_compute=False, use_vgg_loss=False))
    rng = np.random.default_rng(0)
    xy, _ = ray_grid(8)
    cam = base_cam(8)
    B = 1
    f32 = np.float32
    batch = {
        "mels": jnp.asarray(rng.standard_normal((B, 80, 16)).astype(f32)),
        "gt_rgb": jnp.asarray(rng.uniform(0, 1, (B, 32, 32, 3)).astype(f32)),
        "head_mask": jnp.ones((B, 32, 32, 1)),
        "iden": jnp.zeros((B, 100)), "expr": jnp.zeros((B, 79)),
        "text": jnp.zeros((B, 100)), "illu": jnp.zeros((B, 27)),
        "audio_exp": jnp.zeros((B, 64)),
        "Rmat": jnp.asarray(cam.Rmat), "Tvec": jnp.asarray(cam.Tvec),
        "inv_inmat": jnp.asarray(cam.inv_inmat),
        "xy": jnp.asarray(xy),
    }
    state = fns.init(jax.random.key(0), batch)
    state, losses = fns.train_step(state, batch, jax.random.key(1))
    assert float(losses["finite_step"]) == 1.0


def test_render_mesh_sequence():
    # a plane mesh pulsing in z across 3 frames
    G = 5
    xs, ys = np.meshgrid(np.linspace(-1, 1, G), np.linspace(-1, 1, G))
    base = np.stack([xs, ys, np.zeros_like(xs)], -1).reshape(-1, 3).astype(np.float32)
    tri = []
    for r in range(G - 1):
        for c in range(G - 1):
            i = r * G + c
            tri += [[i, i + 1, i + G], [i + 1, i + G + 1, i + G]]
    faces = np.array(tri, np.int32)
    seq = np.stack([base + [0, 0, 0.1 * t] for t in range(3)])
    frames = render_mesh_sequence(seq, faces, image_size=32, focal=20.0, chunk=32)
    assert frames.shape == (3, 32, 32, 3)
    assert np.isfinite(frames).all()
    # mesh covers the center; background is white
    assert frames[0, 16, 16, 0] < 1.0
    assert frames[0, 0, 0, 0] == 1.0


def test_render_mesh_headlight_shading_and_rotation():
    """The reference's effective light rig (ambient 0.2 + -z headlight +
    Blinn specular; its five pyrender lights all share identity
    orientation, render.py:93-112) plus the Rodrigues world-rotation knob
    (render.py:44)."""
    import jax.numpy as jnp

    from nerf3dtalker_tpu.utils.mesh_render import shade_headlight

    # face-on normal: brightest; grazing normal: ambient-only floor
    n = jnp.asarray([[[0.0, 0.0, -1.0], [1.0, 0.0, 0.0]]])
    rgb = np.asarray(shade_headlight(n))
    assert rgb[0, 0].min() > rgb[0, 1].max()
    np.testing.assert_allclose(rgb[0, 1], 0.3 * 0.2, atol=1e-6)

    G = 5
    xs, ys = np.meshgrid(np.linspace(-1, 1, G), np.linspace(-1, 1, G))
    base = np.stack([xs, ys, np.zeros_like(xs)], -1).reshape(-1, 3).astype(np.float32)
    tri = []
    for r in range(G - 1):
        for c in range(G - 1):
            i = r * G + c
            tri += [[i, i + 1, i + G], [i + 1, i + G + 1, i + G]]
    faces = np.array(tri, np.int32)
    seq = base[None]
    plain = render_mesh_sequence(seq, faces, image_size=32, focal=20.0,
                                 chunk=32, shading="headlight")
    rot = render_mesh_sequence(seq, faces, image_size=32, focal=20.0,
                               chunk=32, shading="headlight",
                               rot=np.array([0.0, np.pi, 0.0]))
    dark = render_mesh_sequence(seq, faces, image_size=32, focal=20.0,
                                chunk=32, background=0.0)
    assert np.isfinite(plain).all() and np.isfinite(rot).all()
    # the unrotated plane back-faces the -z headlight (ambient floor);
    # flipping it toward the light brightens the lit region
    assert rot[0, 16, 16].mean() > plain[0, 16, 16].mean() + 0.1
    # black background option (render.py:73-76)
    assert dark[0, 0, 0, 0] == 0.0
