"""SPECTRE: DECA-style 3D face regressor with lip-reading refinement.

Equivalent of reference `lipsrc/lipspectre.py:31-281`: a ResNet50 encoder
regresses FLAME parameters (shape 100, expression 50, global+jaw pose 6,
texture 50, camera 3, light 27 — the DECA coarse code layout), a temporal
perceptual-lipread branch refines expression/jaw over a frame window, and
FLAME decodes to mesh + landmarks. Used frozen as the expression encoder
in the NeRF-3DTalker pipeline.
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax.numpy as jnp

from nerf3dtalker_tpu.models.flame import FlameModel, flame_forward
from nerf3dtalker_tpu.models.resnets import ResNet50

# DECA coarse-code layout (lipspectre param split)
PARAM_DIMS = {
    "shape": 100, "tex": 50, "exp": 50, "pose": 6, "cam": 3, "light": 27,
}
PARAM_ORDER = ("shape", "tex", "exp", "pose", "cam", "light")
TOTAL_DIM = sum(PARAM_DIMS.values())


def split_deca_code(code: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    out = {}
    i = 0
    for k in PARAM_ORDER:
        d = PARAM_DIMS[k]
        out[k] = code[:, i : i + d]
        i += d
    return out


class SpectreEncoder(nn.Module):
    """images [B, 224, 224, 3] -> DECA code [B, 236] + a temporal
    refinement over expression/jaw (lipspectre temporal conv branch)."""

    temporal_kernel: int = 5

    @nn.compact
    def __call__(self, images: jnp.ndarray, train: bool = False):
        feats = ResNet50(name="encoder")(images, train)       # [B*T or B, 2048]
        code = nn.Dense(TOTAL_DIM, name="head")(feats)
        return code

    def refine_sequence(self, codes: jnp.ndarray) -> jnp.ndarray:
        """Temporal conv over [B, T, 236] refining exp+jaw dims
        (lipspectre's perceptual branch applies a temporal conv over
        expression parameters)."""
        exp_lo = PARAM_DIMS["shape"] + PARAM_DIMS["tex"]
        exp_hi = exp_lo + PARAM_DIMS["exp"] + PARAM_DIMS["pose"]
        seg = codes[..., exp_lo:exp_hi]
        delta = nn.Conv(
            seg.shape[-1], (self.temporal_kernel,), padding="SAME",
            kernel_init=nn.initializers.zeros, name="temporal",
        )(seg)
        return codes.at[..., exp_lo:exp_hi].add(delta)


def spectre_decode(
    flame: FlameModel, code: jnp.ndarray
):
    """code -> (verts, landmarks3d) through FLAME
    (lipspectre.decode path)."""
    c = split_deca_code(code)
    return flame_forward(flame, c["shape"], c["exp"], c["pose"])
