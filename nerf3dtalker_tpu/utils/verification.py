"""Face-verification evaluation (ArcFace harness equivalent).

Equivalent of reference
`s_face3d/models/arcface_torch/eval/verification.py:1-407` (LFW-style
10-fold pair verification with threshold sweep) and the in-training
verification callback (`utils/utils_callbacks.py` CallBackVerification):
embed image pairs, sweep thresholds on squared distance of normalized
embeddings, report k-fold cross-validated accuracy.
"""

from __future__ import annotations

from typing import Callable, Tuple

import numpy as np


def _accuracy(dist: np.ndarray, issame: np.ndarray, thresh: float) -> float:
    pred = dist < thresh
    return float(np.mean(pred == issame))


def verification_accuracy(
    emb1: np.ndarray,      # [N, D]
    emb2: np.ndarray,      # [N, D]
    issame: np.ndarray,    # [N] bool
    n_folds: int = 10,
    thresholds: np.ndarray | None = None,
) -> Tuple[float, float, float]:
    """K-fold verification: returns (mean accuracy, std, best threshold)
    (verification.py calculate_roc semantics)."""
    def norm(x):
        return x / np.maximum(np.linalg.norm(x, axis=1, keepdims=True), 1e-10)

    e1, e2 = norm(emb1), norm(emb2)
    dist = np.sum((e1 - e2) ** 2, axis=1)
    if thresholds is None:
        thresholds = np.arange(0, 4, 0.01)

    N = len(dist)
    folds = np.array_split(np.arange(N), n_folds)
    accs, best_ts = [], []
    for k in range(n_folds):
        test_idx = folds[k]
        train_idx = np.concatenate([folds[j] for j in range(n_folds) if j != k])
        train_acc = [_accuracy(dist[train_idx], issame[train_idx], t) for t in thresholds]
        best = thresholds[int(np.argmax(train_acc))]
        accs.append(_accuracy(dist[test_idx], issame[test_idx], best))
        best_ts.append(best)
    return float(np.mean(accs)), float(np.std(accs)), float(np.mean(best_ts))


def embed_and_verify(
    embed_fn: Callable[[np.ndarray], np.ndarray],
    pairs: np.ndarray,     # [N, 2, H, W, 3]
    issame: np.ndarray,
    flip_augment: bool = True,
    batch: int = 64,
):
    """Run the embedding net over pairs (with horizontal-flip feature
    averaging like the reference eval) and compute verification accuracy."""
    def embed_all(imgs):
        out = []
        for i in range(0, len(imgs), batch):
            x = imgs[i : i + batch]
            e = np.asarray(embed_fn(x))
            if flip_augment:
                e = e + np.asarray(embed_fn(x[:, :, ::-1]))
            out.append(e)
        return np.concatenate(out)

    e1 = embed_all(pairs[:, 0])
    e2 = embed_all(pairs[:, 1])
    return verification_accuracy(e1, e2, issame)
