"""Reliable on-chip timing for the axon-tunneled TPU backend.

`jax.block_until_ready` does not reliably synchronize on the experimental
axon backend, and per-iteration host transfers measure tunnel latency
instead of kernel time. This harness times a *chained* in-jit loop — each
iteration's input depends on the previous output so XLA cannot elide or
overlap iterations — with a single scalar host transfer at the end:

    t(N) - t(1) over (N - 1) iterations == steady-state step time.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Tuple

import jax
import jax.numpy as jnp


def enable_compile_cache(path: str = "~/.cache/nerf3dt_xla") -> None:
    """Persist compiled executables to disk so repeat bench/train runs skip
    the multi-minute remote-compile tunnel round trips. No-op if the
    backend doesn't support the persistent cache."""
    try:
        jax.config.update(
            "jax_compilation_cache_dir", os.path.expanduser(path)
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def chained_time(
    step_fn: Callable,
    perturb: Callable,
    init_carry,
    iters: int = 30,
    warmup_iters: int = 1,
) -> float:
    """Time `step_fn` (carry -> output pytree) per iteration.

    `perturb(carry, output) -> carry` must create a data dependency from
    the output back into the next input (e.g. add epsilon * mean(output)).
    Returns seconds per iteration.
    """

    def loop(n):
        @jax.jit
        def run(c):
            def body(c, _):
                out = step_fn(c)
                return perturb(c, out), 0.0
            c, _ = jax.lax.scan(body, c, None, length=n)
            return jax.tree.map(
                lambda x: jnp.sum(x.astype(jnp.float32)), c
            )

        return run

    short = loop(warmup_iters)
    long = loop(warmup_iters + iters)
    # compile both
    float(jax.tree.leaves(short(init_carry))[0])
    float(jax.tree.leaves(long(init_carry))[0])

    t0 = time.perf_counter()
    float(jax.tree.leaves(short(init_carry))[0])
    t_short = time.perf_counter() - t0

    t0 = time.perf_counter()
    float(jax.tree.leaves(long(init_carry))[0])
    t_long = time.perf_counter() - t0

    return max(t_long - t_short, 1e-9) / iters
