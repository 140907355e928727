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


def tree_select(ok: jnp.ndarray, new: Any, old: Any) -> Any:
    """Per-leaf `where(ok, new, old)` over matching pytrees; jit-safe."""
    return jax.tree.map(lambda o, n: jnp.where(ok, n, o), old, new)


def guarded_update(params: Any, new_params: Any, grads: Any) -> Tuple[Any, jnp.ndarray]:
    """Return new_params if grads are finite else old params; jit-safe.

    Usage inside a train step:
      params, ok = guarded_update(params, optax.apply_updates(params, upd), grads)

    NOTE: the optimizer state must be guarded too (a single NaN step would
    otherwise poison Adam's moments permanently) — pass it through
    :func:`tree_select` with the same `ok`.
    """
    ok = tree_isfinite(grads)
    return tree_select(ok, new_params, params), ok


class StepGuard:
    """Host-side NaN monitor with a recovery policy (replaces the
    reference's print-and-continue at talker_trainer.py:1071-1073 and its
    manual resume-from-checkpoint recovery, talker_trainer.py:1167-1201).

    Policies (consumed by ``Trainer.train`` from the device-side
    ``finite_step`` counter — no per-step host sync):

    * ``warn``     — log; per-step param protection is already done inside
                     the jitted step by :func:`guarded_update`;
    * ``rollback`` — tell the caller to restore params+optimizer from the
                     last checkpoint (``epoch_check`` returns "rollback");
    * ``abort``    — raise :class:`FloatingPointError` once the cumulative
                     bad-step run reaches ``max_bad``.
    """

    def __init__(self, max_bad: int = 10, policy: str = "warn"):
        if policy not in ("warn", "rollback", "abort"):
            raise ValueError(f"unknown guard policy {policy!r}")
        self.max_bad = max_bad
        self.policy = policy
        self.bad_run = 0
        self.total_bad = 0
        self.rollbacks = 0

    # per-step API (fitting/bench drivers that sync every step anyway)
    def check(self, ok: bool, step: int) -> bool:
        if ok:
            self.bad_run = 0
            return True
        self._record(1, f"step {step}")
        return False

    # per-epoch API (the Trainer: losses accumulate on device and only
    # materialize once per epoch, so non-finite steps are counted there)
    def epoch_check(self, n_bad: int, n_steps: int, epoch: int) -> str:
        """Returns the action for the caller: "ok", "warn" or "rollback"."""
        if n_bad <= 0:
            self.bad_run = 0
            return "ok"
        self._record(n_bad, f"epoch {epoch} ({n_bad}/{n_steps} steps)")
        if self.policy == "rollback":
            self.bad_run = 0
            self.rollbacks += 1
            return "rollback"
        return "warn"

    def _record(self, n_bad: int, where: str) -> None:
        self.bad_run += n_bad
        self.total_bad += n_bad
        log.warning("non-finite gradients at %s (run of %d)", where, self.bad_run)
        if self.policy == "abort" and self.bad_run >= self.max_bad:
            raise FloatingPointError(
                f"{self.bad_run} consecutive non-finite steps at {where}"
            )
