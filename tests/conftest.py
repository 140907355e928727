"""Test harness: force an 8-device virtual CPU platform so sharding tests
run without TPU hardware (SURVEY.md §4 'multi-device tests on CPU').

Note: the axon TPU plugin overrides JAX_PLATFORMS at interpreter boot via
sitecustomize (jax.config.update('jax_platforms', 'axon,cpu')), so setting
the env var is not enough — we must re-update the config after importing
jax but before any computation.
"""

import os
import sys

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
