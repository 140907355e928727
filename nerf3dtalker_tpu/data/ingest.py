"""Dataset ingestion helpers: h5 subjects, XGaze camera XML, OpenFace AU
CSVs, safetensors.

Equivalents of reference:
  * `XGaze_utils/data_loader_xgaze_new.py:845-1239` h5 subject reading
    (swmr-mode per-frame image/mask/3DMM access);
  * `XGaze_utils/XGaze_camera_Loader.py:8-40` (ETH-XGaze 18-camera
    calibration XML via cv2.FileStorage — parsed directly here);
  * `StandardizedSpace/dataset/data_loader.py:153-159` (OpenFace AU CSV
    columns 26/28/31/33/34 = AU10/14/20/25/26 activations);
  * `s_utils/safetensor_helper.py:3-14` (key-prefix extraction from
    safetensors checkpoints).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

import numpy as np

# OpenFace CSV column indices for the 5 AUs used by the Standardized Space
AU_CSV_COLUMNS = {10: 26, 14: 28, 20: 31, 25: 33, 26: 34}


def load_h5_subject(
    path: str,
    image_key: str = "face_patch",
    mask_key: str = "mask",
    frames: Optional[slice] = None,
) -> Dict[str, np.ndarray]:
    """Read an XGaze-style h5 subject (swmr for concurrent readers, as the
    reference opens it — data_loader_xgaze_new.py:898-900)."""
    import h5py

    out = {}
    with h5py.File(path, "r", swmr=True) as f:
        sl = frames if frames is not None else slice(None)
        for key in f.keys():
            out[key] = np.asarray(f[key][sl])
    if image_key in out and out[image_key].dtype == np.uint8:
        out[image_key] = out[image_key].astype(np.float32) / 255.0
    return out


def parse_openface_au_csv(csv_path: str) -> np.ndarray:
    """OpenFace CSV -> [T, 5] AU activations (AU10/14/20/25/26, the columns
    at dataset/data_loader.py:153-159)."""
    rows = []
    with open(csv_path) as f:
        header = f.readline()
        for line in f:
            vals = line.strip().split(",")
            rows.append([float(vals[c]) for c in AU_CSV_COLUMNS.values()])
    return np.asarray(rows, np.float32)


def parse_xgaze_camera_xml(xml_path: str) -> Dict[str, np.ndarray]:
    """ETH-XGaze calibration XML -> {camera_matrix, distortion,
    cam_rotation, cam_translation} (XGaze_camera_Loader.py:8-40, without
    cv2.FileStorage)."""
    import xml.etree.ElementTree as ET

    tree = ET.parse(xml_path)
    root = tree.getroot()
    out = {}
    names = {
        "Camera_Matrix": "camera_matrix",
        "Distortion_Coefficients": "distortion",
        "cam_rotation": "cam_rotation",
        "cam_translation": "cam_translation",
    }
    for node in root:
        key = names.get(node.tag)
        if key is None:
            continue
        rows = int(node.find("rows").text)
        cols = int(node.find("cols").text)
        data = np.fromstring(
            re.sub(r"\s+", " ", node.find("data").text).strip(), sep=" "
        )
        out[key] = data.reshape(rows, cols).astype(np.float32)
    return out


def load_safetensors_prefix(path: str, prefix: str) -> Dict[str, np.ndarray]:
    """Extract `prefix`-keyed tensors from a safetensors file, stripping
    the prefix (safetensor_helper.load_x_from_safetensor)."""
    from safetensors import safe_open

    out = {}
    with safe_open(path, framework="np") as f:
        for k in f.keys():
            if k.startswith(prefix + "."):
                out[k[len(prefix) + 1 :]] = f.get_tensor(k)
    return out


def torch_state_dict_to_numpy(path: str) -> Dict[str, np.ndarray]:
    """Load a torch checkpoint (CPU) into plain numpy arrays — the bridge
    for all the reference-weight converters in this package."""
    import torch

    sd = torch.load(path, map_location="cpu")
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
            for k, v in sd.items()}
