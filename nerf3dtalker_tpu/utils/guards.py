"""Numerical-failure detection and recovery.

The reference's failure handling is ad-hoc (SURVEY.md §5.2-5.3):
`torch.nan_to_num` on images (HeadNeRFLossUtils.py:133), per-step isnan
warnings (talker_trainer.py:1071-1073), OOM-halve-and-retry in the face
detector (data_loader_xgaze_new.py:136-147). This module makes these
first-class:

  * :func:`tree_isfinite` — one fused all-finite check over a pytree;
  * :func:`guarded_update` — skip the optimizer update when grads are
    non-finite (keeps params; counts skips);
  * :class:`StepGuard` — host-side monitor that warns/aborts on repeated
    non-finite steps and supports checkpoint-rollback recovery.
"""

from __future__ import annotations

import logging
from typing import Any, Tuple

import jax
import jax.numpy as jnp

log = logging.getLogger("nerf3dtalker_tpu.guards")


def tree_isfinite(tree: Any) -> jnp.ndarray:
    """Scalar bool: every element of every leaf is finite."""
    leaves = [jnp.all(jnp.isfinite(x)) for x in jax.tree.leaves(tree)
              if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)]
    if not leaves:
        return jnp.asarray(True)
    return jnp.all(jnp.stack(leaves))


def guarded_update(params: Any, new_params: Any, grads: Any) -> Tuple[Any, jnp.ndarray]:
    """Return new_params if grads are finite else old params; jit-safe.

    Usage inside a train step:
      params, ok = guarded_update(params, optax.apply_updates(params, upd), grads)
    """
    ok = tree_isfinite(grads)
    out = jax.tree.map(
        lambda old, new: jnp.where(ok, new, old), params, new_params
    )
    return out, ok


class StepGuard:
    """Host-side NaN monitor: warn on each bad step, raise after a run of
    them (replaces the reference's print-and-continue at
    talker_trainer.py:1071-1073 with an actual recovery policy)."""

    def __init__(self, max_consecutive_bad: int = 10):
        self.max_bad = max_consecutive_bad
        self.bad_run = 0
        self.total_bad = 0

    def check(self, ok: bool, step: int) -> bool:
        if ok:
            self.bad_run = 0
            return True
        self.bad_run += 1
        self.total_bad += 1
        log.warning("non-finite gradients at step %d (run of %d)", step, self.bad_run)
        if self.bad_run >= self.max_bad:
            raise FloatingPointError(
                f"{self.bad_run} consecutive non-finite steps at step {step}; "
                "roll back to the last checkpoint"
            )
        return False
