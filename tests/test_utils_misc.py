"""Aux subsystem tests: observability, verification, video/code utils, FAN."""

import jax
import jax.numpy as jnp
import numpy as np

from nerf3dtalker_tpu.models.fan import FAN, decode_heatmaps, landmark_heatmap_targets
from nerf3dtalker_tpu.utils.code_utils import (
    euler_orbit_cams,
    lerp_codes,
    random_codes,
    slerp_codes,
)
from nerf3dtalker_tpu.utils.observability import AverageMeter, MetricLogger, Throughput
from nerf3dtalker_tpu.utils.verification import verification_accuracy
from nerf3dtalker_tpu.utils.video import paste_crop, unsharp_enhancer


def test_average_meter_and_throughput():
    m = AverageMeter()
    for v in (1.0, 2.0, 3.0):
        m.update(v)
    assert m.avg == 2.0
    t = Throughput()
    t.tick(10)
    assert t.tick(10) >= 0


def test_metric_logger_jsonl(tmp_path):
    ml = MetricLogger(str(tmp_path))
    ml.log(0, {"loss": 1.0})
    ml.log(1, {"loss": 0.5})
    ml.close()
    import json

    lines = [json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    assert len(lines) == 2 and lines[1]["loss"] == 0.5


def test_verification_separates_classes():
    rng = np.random.default_rng(0)
    D = 16
    base = rng.standard_normal((100, D))
    same1, same2 = base, base + rng.standard_normal((100, D)) * 0.05
    diff2 = rng.standard_normal((100, D))
    emb1 = np.concatenate([same1, base])
    emb2 = np.concatenate([same2, diff2])
    issame = np.concatenate([np.ones(100, bool), np.zeros(100, bool)])
    acc, std, thresh = verification_accuracy(emb1, emb2, issame)
    assert acc > 0.9
    assert 0 < thresh < 4


def test_code_utils():
    rng = np.random.default_rng(0)
    codes = random_codes(rng)
    assert codes["iden"].shape == (1, 100)
    a, b = codes["iden"], codes["iden"] + 1
    path = lerp_codes(a, b, 5)
    assert path.shape == (5, 100)
    np.testing.assert_allclose(path[0], a[0], atol=1e-6)
    np.testing.assert_allclose(path[-1], b[0], atol=1e-6)
    sp = slerp_codes(a, b, 5)
    assert sp.shape == (5, 100)
    cams = euler_orbit_cams(steps=4)
    assert len(cams) == 4
    R = cams[0]["Rmat"][0]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_paste_crop_and_enhancer():
    frame = np.zeros((64, 64, 3), np.float32)
    crop = np.ones((16, 16, 3), np.float32)
    out = paste_crop(frame, crop, (10, 10, 42, 42), feather=4)
    assert out.shape == frame.shape
    assert out[26, 26, 0] > 0.9       # center pasted
    assert out[0, 0, 0] == 0.0        # outside untouched
    enh = unsharp_enhancer(np.random.default_rng(0).uniform(0, 1, (2, 16, 16, 3)).astype(np.float32))
    assert enh.shape == (2, 16, 16, 3)
    assert enh.min() >= 0 and enh.max() <= 1


def test_fan_forward_and_decode():
    m = FAN(n_stacks=1)
    x = jnp.zeros((1, 64, 64, 3))
    p = m.init(jax.random.key(0), x)
    hm = m.apply(p, x)
    assert hm.shape == (1, 16, 16, 68)

    lm_true = jnp.asarray(np.array([[[4.0, 9.0], [12.0, 3.0]]], np.float32))
    tgt = landmark_heatmap_targets(lm_true, hw=16)
    dec = decode_heatmaps(tgt, crop_size=16)
    np.testing.assert_allclose(np.asarray(dec[0]), np.asarray(lm_true[0]), atol=0.3)


def test_arcball_drag_rotation():
    from nerf3dtalker_tpu.utils.interactive import ArcBall, ViewerCamera

    ab = ArcBall(512, 512)
    ab.click((256, 256))
    R = ab.drag((300, 256))
    # proper rotation
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(R) > 0.99
    # horizontal drag rotates about (roughly) the y axis
    assert abs(R[0, 2]) > 1e-3
    # no-op drag = identity
    ab.click((100, 100))
    np.testing.assert_allclose(ab.drag((100, 100)), np.eye(3), atol=1e-6)

    cam = ViewerCamera(img_size=256)
    R0, t0 = cam.w2c()
    cam.rotate(R)
    cam.zoom(0.5)
    R1, t1 = cam.w2c()
    assert not np.allclose(R0, R1)
    assert t1[2] == t0[2] * 0.5


def test_axis_gizmo_draws_axes():
    from nerf3dtalker_tpu.utils.interactive import ViewerCamera, draw_axis_gizmo

    cam = ViewerCamera(img_size=64)
    img = np.zeros((64, 64, 3), np.uint8)
    out = draw_axis_gizmo(img, *cam.w2c())
    # three colored axes drawn; origin projects inside the frame
    assert (out[..., 0] == 255).any() and (out[..., 1] == 255).any() \
        and (out[..., 2] == 255).any()
    assert out.shape == img.shape and not (out == 0).all()


def test_export_roundtrip_and_headnerf_artifact(tmp_path):
    import jax
    import jax.numpy as jnp

    from nerf3dtalker_tpu.utils.export import (
        export_fn, export_headnerf, load_exported,
    )

    def f(x, y):
        return jnp.tanh(x) @ y

    x = jnp.ones((2, 3), jnp.float32)
    y = jnp.full((3, 4), 0.5, jnp.float32)
    blob = export_fn(f, x, y, meta={"name": "toy"})
    call, header = load_exported(bytes(blob))
    assert header["meta"]["name"] == "toy"
    np.testing.assert_allclose(
        np.asarray(call(x, y)), np.asarray(f(x, y)), rtol=1e-6
    )

    # flagship export at a tiny scale: standalone artifact renders
    from nerf3dtalker_tpu.config import NeRFConfig

    cfg = NeRFConfig(featmap_size=8, featmap_nc=32, pred_img_size=32,
                     num_sample_coarse=8, mlp_hidden=32)
    p = tmp_path / "headnerf.n3dt"
    blob = export_headnerf(cfg, path=str(p))
    assert p.read_bytes() == blob
    call, header = load_exported(blob)
    assert header["meta"]["pred_img_size"] == cfg.pred_img_size

    from nerf3dtalker_tpu.utils.camera import base_cam, ray_grid

    xy, _ = ray_grid(cfg.featmap_size)
    cam = base_cam(cfg.featmap_size)
    img = call(
        jnp.asarray(xy),
        jnp.zeros((1, cfg.shape_code_dims)),
        jnp.zeros((1, cfg.appea_code_dims)),
        jnp.zeros((1, cfg.audio_style_dims)),
        jnp.asarray(cam.Rmat),
        jnp.asarray(cam.Tvec),
        jnp.asarray(cam.inv_inmat),
    )
    assert img.shape == (1, cfg.pred_img_size, cfg.pred_img_size, 3)
    assert bool(jnp.all(jnp.isfinite(img)))


def test_write_video_falls_back_to_pngs_without_ffmpeg(tmp_path, monkeypatch):
    import subprocess

    from nerf3dtalker_tpu.utils import video as vid

    def no_ffmpeg(*a, **k):
        raise FileNotFoundError("ffmpeg")

    monkeypatch.setattr(subprocess, "Popen", no_ffmpeg)
    frames = [np.full((8, 8, 3), 0.5, np.float32)] * 3
    out = tmp_path / "clip.mp4"
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        vid.write_video(frames, str(out))
    d = tmp_path / "clip_frames"
    assert sorted(p.name for p in d.iterdir()) == [
        "00000.png", "00001.png", "00002.png"
    ]
