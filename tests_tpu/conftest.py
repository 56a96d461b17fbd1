"""Real-TPU compiled-kernel test lane (VERDICT r3 item 5).

The main suite (tests/) forces the CPU backend and runs every Pallas
kernel under ``interpret=True`` — Mosaic-compiled behavior was previously
pinned only by bench.py and manual drives (the round-2 RT_SLICES=8
regression shipped exactly because of that gap). This lane runs the same
parity assertions against the REAL compiled kernels on the TPU:

    PYTHONPATH=/root/.axon_site:/root/repo python -m pytest tests_tpu/ -q

(The PYTHONPATH prefix loads the TPU plugin; see CLAUDE.md. Expect ~3-5
minutes, compile-dominated. Skips cleanly when no TPU is attached.)
"""

import pytest


def pytest_collection_modifyitems(config, items):
    import jax

    try:
        on_tpu = jax.devices()[0].platform.lower() in ("tpu", "axon")
    except Exception:
        on_tpu = False
    if not on_tpu:
        skip = pytest.mark.skip(reason="no TPU attached (compiled-kernel lane)")
        for item in items:
            item.add_marker(skip)
