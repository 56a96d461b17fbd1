"""Test harness configuration.

Must run before any jax import: forces the CPU backend with 8 virtual
devices so multi-chip sharding logic (parallel/) is exercised without a TPU
pod, per SURVEY.md §4(d). Bench and production paths use the real TPU.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_default_matmul_precision", "highest")
