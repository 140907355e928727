"""Vertex-error metrics for mesh sequences (LVE / FDD).

Equivalent of reference `StandardizedSpace/main/cal_metric.py:7-80`:
  * LVE — Lip Vertex Error: mean over frames of the max squared L2 vertex
    displacement over the mouth region;
  * FDD — upper-face dynamics deviation: difference between GT and
    predicted per-vertex motion std over the upper-face region, averaged.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np


def lip_vertex_error(
    verts_gt: np.ndarray,    # [T, V, 3]
    verts_pred: np.ndarray,  # [T, V, 3]
    mouth_map: Sequence[int],
) -> float:
    """cal_metric.py:69-75."""
    d = np.square(verts_gt[:, mouth_map] - verts_pred[:, mouth_map]).sum(-1)
    return float(np.mean(np.max(d, axis=1)))


def _motion_std(motion: np.ndarray, region: Sequence[int]) -> float:
    d = np.square(motion[:, region]).sum(-1)     # [T, |region|]
    return float(np.mean(np.std(d, axis=0)))


def fdd(
    verts_gt: np.ndarray,
    verts_pred: np.ndarray,
    template: np.ndarray,    # [V, 3]
    upper_map: Sequence[int],
) -> float:
    """cal_metric.py:50-62: gt motion std minus pred motion std."""
    mg = verts_gt - template[None]
    mp = verts_pred - template[None]
    return _motion_std(mg, upper_map) - _motion_std(mp, upper_map)
