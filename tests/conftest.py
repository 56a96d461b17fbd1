"""Test harness configuration.

Runs before any test module: forces the CPU backend with 8 virtual devices so
multi-chip sharding logic (parallel/) is exercised without a TPU pod, per
SURVEY.md §4(d). Bench and production paths use the real TPU.

The env var alone is not enough on this image — the TPU plugin's site hook
sets ``jax_platforms`` at the *config* level, which outranks ``JAX_PLATFORMS``
— so the config is updated explicitly after importing jax.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

assert len(jax.devices()) == 8, "test harness expects 8 virtual CPU devices"
