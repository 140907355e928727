"""Small model-zoo stragglers.

  * :class:`LandmarkEstimator` — the legacy small CNN 2D-landmark
    regressor (reference Landmark_Estimator/model.py).
  * :class:`ExpressionLossNet` — EmoNet-style expression feature loss
    (lipsrc/models/expression_loss.py: resnet trunk -> emotion features;
    loss = feature L1 between gen and gt).
  * :func:`gan_loss` — LSGAN/vanilla GAN criterion
    (StandardizedSpace/main/loss.py GANLoss).
  * MODEL_REGISTRY / :func:`get_model` — name -> constructor factory
    (reference networks.py:4-55 NetworksFactory).
  * :func:`draw_side_by_side` — GT|render comparison strips
    (talker_trainer.py:1203-1216 temp_image dumps, tool_funcs.draw_res_img).
"""

from __future__ import annotations

from typing import Callable, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


class LandmarkEstimator(nn.Module):
    """[B, 64, 64, 1] gray crop -> [B, 68, 2] landmark coordinates."""

    n_landmarks: int = 68

    @nn.compact
    def __call__(self, x, train: bool = False):
        for i, c in enumerate((32, 64, 128, 256)):
            x = nn.Conv(c, (3, 3), strides=(2, 2), padding="SAME", name=f"conv{i}")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = nn.relu(nn.Dense(512, name="fc1")(x))
        out = nn.Dense(self.n_landmarks * 2, name="fc2")(x)
        return out.reshape(-1, self.n_landmarks, 2)


class ExpressionLossNet(nn.Module):
    """Emotion-feature extractor for the expression loss: small resnet
    trunk -> 256-d features + 8-class emotion logits."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        from nerf3dtalker_tpu.models.bisenet import BasicBlock

        x = nn.Conv(32, (7, 7), strides=(2, 2), padding=[(3, 3), (3, 3)],
                    name="stem")(x)
        x = nn.relu(x)
        for li, (c, s) in enumerate([(64, 2), (128, 2), (256, 2)]):
            x = BasicBlock(c, s, name=f"layer{li}")(x, train)
        feat = jnp.mean(x, axis=(1, 2))
        logits = nn.Dense(8, name="head")(feat)
        return feat, logits


def expression_loss(params, net: ExpressionLossNet, gen, gt):
    """Feature L1 between generated and GT frames (expression_loss.py)."""
    import jax

    fg, _ = net.apply(params, gen)
    ft, _ = net.apply(params, jax.lax.stop_gradient(gt))
    return jnp.mean(jnp.abs(fg - jax.lax.stop_gradient(ft)))


def gan_loss(pred: jnp.ndarray, target_is_real: bool, mode: str = "lsgan"):
    """GANLoss (StandardizedSpace/main/loss.py): lsgan -> MSE to 0/1;
    vanilla -> BCE-with-logits."""
    t = 1.0 if target_is_real else 0.0
    if mode == "lsgan":
        return jnp.mean((pred - t) ** 2)
    if mode == "vanilla":
        return jnp.mean(
            jnp.maximum(pred, 0) - pred * t + jnp.log1p(jnp.exp(-jnp.abs(pred)))
        )
    raise ValueError(mode)


# ---- model factory (networks.py NetworksFactory equivalent) ----

def _registry() -> Dict[str, Callable]:
    from nerf3dtalker_tpu.models import HeadNeRF, NeRFMLP, NeuralRenderer
    from nerf3dtalker_tpu.models.audio import (
        Audio2Style, FusAudio2Style, SimpleWrapperV2,
    )
    from nerf3dtalker_tpu.models.audio2pose import Audio2PoseCVAE
    from nerf3dtalker_tpu.models.bisenet import BiSeNet
    from nerf3dtalker_tpu.models.fan import FAN
    from nerf3dtalker_tpu.models.lipreader import VisualFrontend
    from nerf3dtalker_tpu.models.resnets import (
        IResNet, MobileFaceNet, ReconNet,
    )
    from nerf3dtalker_tpu.models.s3fd import S3FD
    from nerf3dtalker_tpu.models.spectre import SpectreEncoder
    from nerf3dtalker_tpu.models.vq import AUClassifier, VQAutoEncoder
    from nerf3dtalker_tpu.models.vq.stage2 import CodeTalker
    from nerf3dtalker_tpu.models.wav2lip import SyncNetColor, Wav2Lip

    return {
        "headnerf": HeadNeRF,
        "nerf_mlp": NeRFMLP,
        "neural_renderer": NeuralRenderer,
        "audio2style": Audio2Style,
        "fus_audio2style": FusAudio2Style,
        "audio2exp": SimpleWrapperV2,
        "audio2pose": Audio2PoseCVAE,
        "wav2lip": Wav2Lip,
        "syncnet": SyncNetColor,
        "vq_autoencoder": VQAutoEncoder,
        "au_classifier": AUClassifier,
        "codetalker": CodeTalker,
        "bisenet": BiSeNet,
        "s3fd": S3FD,
        "fan": FAN,
        "lipreader": VisualFrontend,
        "recon_net": ReconNet,
        "iresnet": IResNet,
        "mobilefacenet": MobileFaceNet,
        "spectre": SpectreEncoder,
        "landmark_estimator": LandmarkEstimator,
        "expression_loss": ExpressionLossNet,
    }


def get_model(name: str, *args, **kwargs):
    """name -> constructed flax module (NetworksFactory.get_by_name)."""
    reg = _registry()
    if name not in reg:
        raise ValueError(f"unknown model '{name}'; known: {sorted(reg)}")
    return reg[name](*args, **kwargs)


def draw_side_by_side(gt: np.ndarray, pred: np.ndarray) -> np.ndarray:
    """[H,W,3] pair -> [H, 2W, 3] uint8 comparison strip."""
    def u8(x):
        return np.clip(np.asarray(x) * 255, 0, 255).astype(np.uint8)

    return np.concatenate([u8(gt), u8(pred)], axis=1)
