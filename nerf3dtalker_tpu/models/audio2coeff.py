"""Audio-to-coefficient driver (SadTalker Audio2Coeff equivalent).

Equivalent of reference `s_test_audio2coeff.py:25-130`: loads the netG
expression regressor from a safetensors checkpoint (key prefix
`audio2exp`), runs the per-frame expression prediction, and applies
Savitzky-Golay smoothing to reference poses (the pose CVAE path is present
but bypassed at inference, :36-54 — same here via `use_pose_cvae`).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np


class Audio2Coeff:
    def __init__(self, netg_params=None, pose_params=None):
        from nerf3dtalker_tpu.models.audio import SimpleWrapperV2

        self.netg = SimpleWrapperV2()
        self.netg_params = netg_params
        self.pose_params = pose_params

    @classmethod
    def from_safetensors(cls, path: str) -> "Audio2Coeff":
        """Load netG weights from a SadTalker safetensors checkpoint
        (s_utils/safetensor_helper key-prefix extraction)."""
        from nerf3dtalker_tpu.data.ingest import load_safetensors_prefix

        from nerf3dtalker_tpu.utils.convert import convert_simple_wrapper_v2

        sd = load_safetensors_prefix(path, "audio2exp")
        if not sd:
            raise ValueError(f"no 'audio2exp.*' tensors found in {path}")
        # strip the torch wrapper prefix (s_test_audio2coeff.py:63-65 loads
        # `audio2exp_model.netG.*`)
        inner = {}
        for k, v in sd.items():
            for pre in ("audio2exp_model.netG.", "netG.", ""):
                if k.startswith(pre):
                    inner[k[len(pre):]] = v
                    break
        return cls(netg_params=convert_simple_wrapper_v2(inner))

    def generate(
        self,
        mels: np.ndarray,          # [T, 80, 16]
        ref_exp64: np.ndarray,     # [64]
        ratios: np.ndarray,        # [T]
        ref_pose: Optional[np.ndarray] = None,   # [T, 6]
        smooth_pose: bool = True,
    ) -> Dict[str, np.ndarray]:
        """-> {'exp': [T, 64], 'pose': [T, 6] (smoothed ref)}."""
        import jax.numpy as jnp

        from nerf3dtalker_tpu.models.audio import audio2exp_sequence

        if self.netg_params is None:
            exp = np.zeros((len(mels), 64), np.float32)
        else:
            exp = np.asarray(
                audio2exp_sequence(
                    self.netg.apply, self.netg_params,
                    jnp.asarray(mels)[..., None], jnp.asarray(ref_exp64),
                    jnp.asarray(ratios),
                )
            )
        out = {"exp": exp}
        if ref_pose is not None:
            pose = np.asarray(ref_pose, np.float32)
            if smooth_pose:
                from nerf3dtalker_tpu.models.audio2pose import savgol_smooth_pose

                pose = savgol_smooth_pose(pose)
            out["pose"] = pose
        return out
