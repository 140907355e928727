"""SPECTRE: DECA-style 3D face regressor with lip-reading refinement.

Equivalent of reference `lipsrc/lipspectre.py:31-281`:

  * ``SpectreEncoder`` — E_flame (`lipsrc/models/encoders.py:66-86`
    ResnetEncoder): ResNet50 trunk -> Linear(2048,1024) -> ReLU ->
    Linear(1024, 236), regressing the DECA coarse code (shape 100,
    texture 50, expression 50, global+jaw pose 6, camera 3, light 27).
  * ``PerceptualExpressionEncoder`` — E_expression
    (`encoders.py:8-63` PerceptualEncoder): per-frame backbone features
    -> temporal Conv1d(k=5) + BN + ReLU -> Linear(256, 53) emitting a
    refined (expression[50], jaw[3]) with ReLU on jaw-x (encoders.py:61).
    The reference's default backbone is mobilenetv2 with resnet50 as the
    supported alternative (`lipconfig.py:96,133`); this implementation
    uses the ResNet50 variant (shared trunk code, identical head shapes).
  * ``spectre_encode`` — the SPECTRE.encode composition
    (`lipspectre.py:141-156`): E_flame's code split into the DECA dict,
    then expression and jaw OVERRIDDEN by E_expression's outputs, with
    the original DECA exp/jaw returned alongside (used by the relative
    losses in the SPECTRE trainer).
  * ``spectre_decode`` — code -> FLAME verts/landmarks
    (`lipspectre.py:157-...` decode's geometry path).

Used frozen as the expression encoder in the NeRF-3DTalker pipeline.
"""

from __future__ import annotations

from typing import Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp

from nerf3dtalker_tpu.models.flame import FlameModel, flame_forward
from nerf3dtalker_tpu.models.resnets import ResNet50

# DECA coarse-code layout (lipspectre param split, lipspectre.py:59-66)
PARAM_DIMS = {
    "shape": 100, "tex": 50, "exp": 50, "pose": 6, "cam": 3, "light": 27,
}
PARAM_ORDER = ("shape", "tex", "exp", "pose", "cam", "light")
TOTAL_DIM = sum(PARAM_DIMS.values())


def split_deca_code(code: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """decompose_code (lipspectre.py:125-139; `light` kept flat [27] —
    reshape to [9, 3] at the SH-lighting call site)."""
    out = {}
    i = 0
    for k in PARAM_ORDER:
        d = PARAM_DIMS[k]
        out[k] = code[:, i : i + d]
        i += d
    return out


class SpectreEncoder(nn.Module):
    """E_flame: images [B, H, W, 3] -> DECA code [B, 236]
    (ResnetEncoder, encoders.py:66-86)."""

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        feats = ResNet50(name="encoder")(images, train)       # [B, 2048]
        x = nn.relu(nn.Dense(1024, name="fc0")(feats))
        return nn.Dense(TOTAL_DIM, name="fc1")(x)


class PerceptualExpressionEncoder(nn.Module):
    """E_expression: frames -> refined (exp [.., 50], jaw [.., 3])
    (PerceptualEncoder, encoders.py:8-63).

    Accepts video batches [B, T, H, W, 3] or a single sequence
    [T, H, W, 3] (the reference's two input layouts, encoders.py:32-50).
    The temporal conv runs over T, so the refinement sees the lip-motion
    context window rather than independent frames."""

    temporal_kernel: int = 5

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        video = images.ndim == 5
        if not video:
            images = images[None]                 # [1, T, H, W, 3]
        B, T = images.shape[:2]
        flat = images.reshape((B * T,) + images.shape[2:])
        feats = ResNet50(name="backbone")(flat, train)         # [B*T, 2048]
        feats = feats.reshape(B, T, -1)
        x = nn.Conv(256, (self.temporal_kernel,), padding="SAME",
                    name="temporal")(feats)                    # Conv1d k5 p2
        x = nn.BatchNorm(use_running_average=not train,
                         name="temporal_bn")(x)
        x = nn.relu(x)
        p = nn.Dense(53, name="head")(x)                       # Linear(256,53)
        # "jaw x is highly improbably negative" relu (encoders.py:61)
        jaw = jnp.concatenate(
            [nn.relu(p[..., 50:51]), p[..., 51:53]], axis=-1
        )
        exp = p[..., :50]
        if not video:
            exp, jaw = exp[0], jaw[0]
        return exp, jaw


def spectre_encode(
    flame_code: jnp.ndarray,        # E_flame output [T, 236]
    exp: jnp.ndarray,               # E_expression exp [T, 50]
    jaw: jnp.ndarray,               # E_expression jaw [T, 3]
) -> Tuple[Dict[str, jnp.ndarray], jnp.ndarray, jnp.ndarray]:
    """SPECTRE.encode composition (lipspectre.py:141-156): the DECA code
    dict with exp and pose[3:] overridden by the perceptual branch;
    returns (codedict, deca_exp, deca_jaw) — the pre-override values ride
    along for the trainer's relative regularizers."""
    code = split_deca_code(flame_code)
    deca_exp = code["exp"]
    deca_jaw = code["pose"][..., 3:]
    code = dict(code)
    code["exp"] = exp
    code["pose"] = jnp.concatenate([code["pose"][..., :3], jaw], axis=-1)
    return code, deca_exp, deca_jaw


def spectre_decode(
    flame: FlameModel, code: jnp.ndarray
):
    """code -> (verts, landmarks3d) through FLAME
    (lipspectre.decode geometry path)."""
    c = split_deca_code(code)
    return flame_forward(flame, c["shape"], c["exp"], c["pose"])
