"""Orbax checkpointing with self-describing configs.

Replaces the reference's torch.save dict checkpoints
(talker_trainer.py:913-937 `{epoch, net, audio2style, optim_*, para}`) with
orbax; the `para` idea — embedding the model hyperparams so checkpoints are
self-describing (talker_trainer.py:915-918, consumed at train.py:18-22) —
is kept by storing the dataclass config as JSON metadata.

Also provides the reference's *soft* (shape-matching) partial load
(`load_ckpt`, talker_trainer.py:557-567) for pytrees.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Optional, Tuple

import jax
import numpy as np


def save_checkpoint(
    path: str, state: Any, config: Any = None, step: int = 0,
    metrics: Optional[dict] = None,
) -> None:
    """Save a pytree + self-describing config (+validation metrics) to
    `path` (a directory)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.join(path, f"state_{step}"), state)
    ckptr.wait_until_finished()
    if config is not None or metrics is not None:
        meta = {"step": step}
        if config is not None:
            meta["config"] = (
                dataclasses.asdict(config)
                if dataclasses.is_dataclass(config)
                else config
            )
            meta["config_class"] = type(config).__name__
        if metrics is not None:
            # the reference embeds SSIM/PSNR/LPIPS in checkpoint
            # filenames (talker_trainer.py:920-937); we stamp them here
            meta["metrics"] = metrics
        with open(os.path.join(path, f"meta_{step}.json"), "w") as f:
            json.dump(meta, f, indent=2)


def restore_checkpoint(
    path: str, target: Any, step: Optional[int] = None
) -> Tuple[Any, dict]:
    """Restore (state, meta). `target` supplies structure/shardings."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    if step is None:
        step = latest_step(path)
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.join(path, f"state_{step}"), target=target)
    return state, load_meta(path, step)


def latest_step(path: str) -> int:
    """Newest COMPLETE step saved under `path`.

    Ignores anything that isn't `state_<int>` — in particular orbax's
    `state_N.orbax-checkpoint-tmp-*` leftovers from an interrupted save,
    which is exactly when resume/rollback must still work."""
    path = os.path.abspath(path)
    steps = sorted(
        int(d.split("_", 1)[1])
        for d in os.listdir(path)
        if d.startswith("state_") and d.split("_", 1)[1].isdigit()
    )
    if not steps:
        raise FileNotFoundError(f"no checkpoints under {path}")
    return steps[-1]


def load_meta(path: str, step: Optional[int] = None) -> dict:
    """Read the config/metrics metadata of a checkpoint without touching
    the (potentially large) state — the reference's `para` block
    (talker_trainer.py:915-918) read back at train.py:18-22."""
    if step is None:
        step = latest_step(path)
    meta_path = os.path.join(os.path.abspath(path), f"meta_{step}.json")
    if not os.path.exists(meta_path):
        return {"step": step}
    with open(meta_path) as f:
        return json.load(f)


def has_checkpoint(path: str) -> bool:
    try:
        latest_step(path)
        return True
    except (FileNotFoundError, OSError, ValueError):
        return False


def soft_load(target: Any, source: Any) -> Any:
    """Copy leaves from `source` into `target` wherever path+shape match —
    the reference's partial checkpoint surgery (talker_trainer.py:557-567).

    Works across tree-structure mismatches: leaves are matched by their
    key-path string.
    """
    import jax.tree_util as jtu

    src = {
        jtu.keystr(k): v for k, v in jtu.tree_flatten_with_path(source)[0]
    }

    def pick(path, leaf):
        key = jtu.keystr(path)
        cand = src.get(key)
        if cand is not None and np.shape(cand) == np.shape(leaf):
            return jax.numpy.asarray(cand, dtype=leaf.dtype)
        return leaf

    flat, treedef = jtu.tree_flatten_with_path(target)
    return treedef.unflatten([pick(p, l) for p, l in flat])


def save_pytree_npz(path: str, tree: Any) -> None:
    """Flatten a nested-dict param tree to a single .npz ('/'-joined
    keys) — the interchange format for converted external weights
    (GFPGAN, enhancers) that don't warrant a full orbax directory."""
    flat = {}

    def walk(prefix, node):
        if isinstance(node, dict):
            for k, v in node.items():
                walk(f"{prefix}/{k}" if prefix else str(k), v)
        else:
            flat[prefix] = np.asarray(node)

    walk("", tree)
    np.savez(path, **flat)


def load_pytree_npz(path: str) -> Any:
    """Inverse of :func:`save_pytree_npz`."""
    out: dict = {}
    with np.load(path) as z:
        for key in z.files:
            node = out
            parts = key.split("/")
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = jax.numpy.asarray(z[key])
    return out


def widen_input_channels(kernel: np.ndarray, new_in: int) -> np.ndarray:
    """Zero-pad a dense kernel's input dim — the reference's gaze-dim weight
    surgery (`_load_model_parameter`, talker_trainer.py:736-747) which widens
    conv weights with zero-initialized extra input channels."""
    old_in, out = kernel.shape
    if new_in < old_in:
        raise ValueError("can only widen")
    pad = np.zeros((new_in - old_in, out), dtype=kernel.dtype)
    return np.concatenate([np.asarray(kernel), pad], axis=0)
