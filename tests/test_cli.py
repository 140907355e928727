"""CLI surface smoke tests (the reference's script entry points —
train.py, s_inference.py, DataProcess/* — unified under one argparse CLI)."""

import numpy as np

from nerf3dtalker_tpu.cli import main


def test_infer_coeff_from_text(tmp_path):
    out = tmp_path / "coeffs.npz"
    main([
        "infer-coeff", "--text", "hello tpu talking head",
        "--out", str(out), "--seed", "3",
    ])
    z = np.load(out)
    T = z["exp"].shape[0]
    assert z["exp"].shape == (T, 64) and T >= 25
    assert z["pose"].shape == (T, 6)
    assert z["mels"].shape == (T, 80, 16)
    assert np.isfinite(z["mels"]).all()


def test_preprocess_subject_npz(tmp_path):
    from nerf3dtalker_tpu.data.tts import synthesize_placeholder

    frames = (np.random.default_rng(0).uniform(0, 1, (4, 32, 32, 3))).astype(
        np.float32
    )
    fpath = tmp_path / "frames.npy"
    np.save(fpath, frames)
    wav = synthesize_placeholder("four frames of audio", path=str(tmp_path / "a.wav"))
    out = tmp_path / "subject.npz"
    main([
        "preprocess", "--frames", str(fpath), "--wav", wav,
        "--featmap-size", "8", "--out", str(out),
    ])
    z = np.load(out)
    assert "mels" in z and "head_mask" in z


def test_animate_end_to_end(tmp_path):
    """wav -> Audio2Style -> batched HeadNeRF render -> frame stack
    (FittingSingleImage_new.py re-render loop, videoio mux skipped)."""
    from nerf3dtalker_tpu.data.tts import synthesize_placeholder

    wav = synthesize_placeholder("animate me", path=str(tmp_path / "a.wav"))
    out = tmp_path / "anim.npy"
    main([
        "animate", "--wav", wav, "--featmap-size", "8", "--img-size", "32",
        "--max-frames", "5", "--chunk", "2", "--out", str(out),
    ])
    frames = np.load(out)
    assert frames.shape == (5, 32, 32, 3)
    assert np.isfinite(frames).all()
    assert frames.min() >= 0.0 and frames.max() <= 1.0


def test_animate_enhancer_flag(tmp_path):
    """--enhancer gfpgan/unsharp wiring (the reference's face_enhancer
    slot, s_utils/face_enhancer.py:26): frames pass through the restorer
    selected on the CLI."""
    import jax
    import jax.numpy as jnp

    from nerf3dtalker_tpu.data.tts import synthesize_placeholder
    from nerf3dtalker_tpu.models.gfpgan import GFPGANClean
    from nerf3dtalker_tpu.utils.checkpoints import (
        load_pytree_npz, save_pytree_npz,
    )

    wav = synthesize_placeholder("enhance", path=str(tmp_path / "a.wav"))
    m = GFPGANClean(out_size=32)
    gp = m.init(jax.random.key(0), jnp.zeros((1, 32, 32, 3)))
    wpath = tmp_path / "gfpgan.npz"
    save_pytree_npz(str(wpath), gp)
    # round trip preserves the tree
    rt = load_pytree_npz(str(wpath))
    assert jax.tree.all(jax.tree.map(
        lambda a, b: np.allclose(np.asarray(a), np.asarray(b)), gp, rt
    ))

    plain, enhanced = tmp_path / "p.npy", tmp_path / "e.npy"
    base = [
        "animate", "--wav", wav, "--featmap-size", "8", "--img-size", "32",
        "--max-frames", "3", "--chunk", "1",
    ]
    main(base + ["--out", str(plain)])
    main(base + ["--enhancer", "gfpgan", "--enhancer-weights", str(wpath),
                 "--out", str(enhanced)])
    a, b = np.load(plain), np.load(enhanced)
    assert a.shape == b.shape == (3, 32, 32, 3)
    assert not np.allclose(a, b)          # the restorer actually ran
    assert b.min() >= 0.0 and b.max() <= 1.0
    # unsharp built-in needs no weights
    main(base + ["--enhancer", "unsharp", "--out", str(enhanced)])
    c = np.load(enhanced)
    assert c.shape == a.shape and not np.allclose(a, c)


def test_fit_smoke(tmp_path):
    """Single-image fitting driver (FittingSingleImage_new.py:620-903)."""
    out = tmp_path / "fitted.npz"
    main([
        "fit", "--featmap-size", "8", "--img-size", "32",
        "--iters", "3", "--out", str(out),
    ])
    z = np.load(out)
    assert z["iden_offset"].shape == (1, 100)
    assert z["expr_offset"].shape == (1, 79)
    assert np.isfinite(z["appea_offset"]).all()


def test_eval_vq_writes_genplus_frames(tmp_path, capsys):
    """test_vq-style eval driver: reconstruct a split, write gen+/ PNGs
    (StandardizedSpace/main/test_vq.py:52-150)."""
    import json
    import os

    out_dir = tmp_path / "gen+"
    main([
        "eval-vq", "--img-size", "16", "--hidden", "32", "--embed-dim", "32",
        "--n-embed", "64", "--out", str(out_dir),
    ])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["num_frames"] == 4 and "rec_l1" in rec
    pngs = [f for f in os.listdir(out_dir) if f.endswith(".png")]
    assert len(pngs) == 4


def test_infer_stage2_wav_to_frames(tmp_path, capsys):
    """VERDICT r2 #4: wav -> in-repo wav2vec2 -> CodeTalker autoregressive
    codes -> decoded frame sequence, no external feature files."""
    import json

    from nerf3dtalker_tpu.data.tts import synthesize_placeholder

    wav = synthesize_placeholder("stage two", path=str(tmp_path / "s2.wav"))
    out = tmp_path / "frames.npy"
    main([
        "infer-stage2", "--wav", wav, "--frames", "3", "--img-size", "16",
        "--hidden", "32", "--embed-dim", "32", "--n-embed", "64",
        "--out", str(out),
    ])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["finite"] and rec["frames"] == 3
    pred = np.load(out)
    assert pred.shape == (1, 3, 16 * 16 * 3)


def test_export_cli_writes_standalone_artifact(tmp_path, capsys):
    """Deployment export (torch2onnx analog): StableHLO artifact loads and
    renders without the model code path."""
    import json

    out = tmp_path / "hn.n3dt"
    main(["export", "--featmap-size", "8", "--img-size", "32",
          "--out", str(out)])
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec["bytes"] == out.stat().st_size > 0

    from nerf3dtalker_tpu.utils.export import load_exported

    call, header = load_exported(out.read_bytes())
    assert header["meta"]["model"] == "headnerf"


def test_render_consumes_fitted_latents(tmp_path, capsys):
    """fit -> render flow: the orbit renders the fitted subject
    (FittingSingleImage_new.py save_res semantics)."""
    z = tmp_path / "fitted.npz"
    rng = np.random.default_rng(0)
    np.savez(
        z,
        iden=rng.standard_normal((1, 100)).astype(np.float32) * 0.1,
        expr=rng.standard_normal((1, 79)).astype(np.float32) * 0.1,
        text=rng.standard_normal((1, 100)).astype(np.float32) * 0.1,
        illu=rng.standard_normal((1, 27)).astype(np.float32) * 0.1,
        iden_offset=np.zeros((1, 100), np.float32),
        expr_offset=np.zeros((1, 79), np.float32),
        appea_offset=np.zeros((1, 127), np.float32),
    )
    out = tmp_path / "orbit.npy"
    main(["render", "--featmap-size", "8", "--img-size", "32",
          "--latents", str(z), "--views", "2", "--out", str(out)])
    views = np.load(out)
    assert views.shape[0] == 2 and views.shape[-1] == 3
    assert np.isfinite(views).all()


def test_render_loads_checkpoint_params(tmp_path, capsys):
    """--ckpt path: checkpoint surgery (_nerf_params_from_ckpt) restores
    trained NeRF params into the render model."""
    import jax
    import jax.numpy as jnp

    from nerf3dtalker_tpu.config import NeRFConfig
    from nerf3dtalker_tpu.models import HeadNeRF
    from nerf3dtalker_tpu.utils.camera import base_cam, ray_grid
    from nerf3dtalker_tpu.utils.checkpoints import save_checkpoint

    cfg = NeRFConfig(featmap_size=8, featmap_nc=32, pred_img_size=32,
                     num_sample_coarse=8, mlp_hidden=32)
    model = HeadNeRF(cfg)
    xy, _ = ray_grid(cfg.featmap_size)
    cam = base_cam(cfg.featmap_size)
    params = model.init(
        jax.random.key(3), batch_xy=jnp.asarray(xy),
        shape_code=jnp.zeros((1, cfg.shape_code_dims)),
        appea_code=jnp.zeros((1, cfg.appea_code_dims)),
        audio_style=jnp.zeros((1, cfg.audio_style_dims)),
        Rmat=jnp.asarray(cam.Rmat), Tvec=jnp.asarray(cam.Tvec),
        inv_inmat=jnp.asarray(cam.inv_inmat),
    )
    ckpt = tmp_path / "ckpt"
    save_checkpoint(str(ckpt), {"params": {"nerf": params}}, step=0)

    out = tmp_path / "orbit.npy"
    main(["render", "--featmap-size", "8", "--img-size", "32",
          "--ckpt", str(ckpt), "--views", "1", "--out", str(out)])
    views = np.load(out)
    assert views.shape[0] == 1 and np.isfinite(views).all()


def test_train_cli_resume_trace_guard(tmp_path, capsys):
    """The round-4 train flags end-to-end through the CLI: metrics.jsonl
    + profiler trace land under --log-dir/--trace-dir, and --resume
    rebuilds from the checkpoint alone (graceful no-op when the stored
    step already covers --epochs)."""
    import json
    import os

    ckpt = str(tmp_path / "ckpt")
    logs = str(tmp_path / "logs")
    trace = str(tmp_path / "trace")
    base = [
        "train", "--featmap-size", "8", "--img-size", "32", "--epochs", "1",
        "--no-vgg", "--batch-size", "2", "--ckpt-dir", ckpt,
        "--log-dir", logs, "--trace-dir", trace, "--trace-steps", "1",
        "--guard-policy", "rollback",
    ]
    main(base)
    rec = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert "total_loss" in rec and rec["finite_step"] == 1.0
    assert os.path.exists(os.path.join(logs, "metrics.jsonl"))
    assert any(fs for _, _, fs in os.walk(trace))
    # resume with the same --epochs: graceful nothing-to-do record
    main(base + ["--resume"])
    rec2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec2.get("note", "").startswith("checkpoint already")
    # resume with more epochs: continues training
    more = [a if a != "1" else "2" for a in base]
    main(more + ["--resume"])
    rec3 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert rec3["epoch"] == 1
