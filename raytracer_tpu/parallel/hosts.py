"""Multi-host initialization and cross-host mesh construction.

The reference has no communication backend at all (single process + OpenMP
threads, SURVEY.md §2 checklist); the TPU-native equivalent is
``jax.distributed.initialize`` + a mesh spanning every chip in the slice.
Pixel rows shard over hosts (outer axis, DCN) x chips (inner, ICI); scene
parameters replicate, and the fit step's gradient psum is the only
cross-host collective.

On a single host these helpers degrade to the local device set, so the same
driver script runs everywhere.
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

from raytracer_tpu.parallel.mesh import PRIM_AXIS, PX_AXIS

__all__ = ["initialize_distributed", "slice_mesh", "is_multi_host"]


def initialize_distributed(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Initialize JAX's distributed runtime if running multi-process.

    With no arguments, relies on the TPU environment's auto-detection
    (GKE/GCE metadata); auto-detection failure on a plain single-process
    machine returns False (expected — local development needs no branches).
    With EXPLICIT arguments the caller asked for multi-process, so any
    failure is a genuine misconfiguration and re-raises instead of silently
    degrading to a single-host run.
    """
    # NOTE: must not touch jax.process_count()/jax.devices() here — any
    # backend query before jax.distributed.initialize() is a hard error.
    if jax.distributed.is_initialized():
        return True
    explicit = coordinator_address is not None or num_processes is not None
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except (RuntimeError, ValueError) as e:
        if explicit:
            raise
        import logging

        logging.getLogger(__name__).info(
            "jax.distributed auto-detection unavailable (%s); single-process", e
        )
        return False


def is_multi_host() -> bool:
    return jax.process_count() > 1


def slice_mesh(prim: int = 1) -> Mesh:
    """A ('px', 'prim') mesh over every chip in the slice, host-major.

    Devices are ordered host-outermost so the 'px' axis crosses DCN at its
    coarsest granularity (pixel tiles never communicate, so DCN carries only
    the fit step's gradient all-reduce) while the 'prim' axis — which
    all_gathers every bounce — stays within a host's ICI domain.
    """
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devs)
    if n % prim:
        raise ValueError(f"{n} devices not divisible by prim={prim}")
    arr = np.array(devs).reshape(n // prim, prim)
    return Mesh(arr, (PX_AXIS, PRIM_AXIS))
