"""Multi-host helpers: slice_mesh construction + distributed-init smoke tests.

``slice_mesh`` runs in-process on the 8 virtual CPU devices; the
``jax.distributed.initialize`` paths run in subprocesses (initialization is
one-way per process, so it must never happen inside the test process).
"""

import socket
import subprocess
import sys
import textwrap

import pytest

from raytracer_tpu.parallel.hosts import is_multi_host, slice_mesh
from raytracer_tpu.parallel.mesh import PRIM_AXIS, PX_AXIS


def test_slice_mesh_shapes():
    mesh = slice_mesh()
    assert mesh.axis_names == (PX_AXIS, PRIM_AXIS)
    assert mesh.shape[PX_AXIS] == 8 and mesh.shape[PRIM_AXIS] == 1

    mesh2 = slice_mesh(prim=2)
    assert mesh2.shape[PX_AXIS] == 4 and mesh2.shape[PRIM_AXIS] == 2
    assert mesh2.devices.size == 8


def test_slice_mesh_orders_hosts_outermost():
    mesh = slice_mesh(prim=4)
    # Single-process: device order must still be deterministic (sorted by id).
    ids = [d.id for d in mesh.devices.flat]
    assert ids == sorted(ids)


def test_slice_mesh_indivisible_raises():
    with pytest.raises(ValueError, match="not divisible"):
        slice_mesh(prim=3)


def test_is_multi_host_single_process():
    assert is_multi_host() is False


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


_WORKER = textwrap.dedent(
    """
    import sys
    import jax

    jax.config.update("jax_platforms", "cpu")
    from raytracer_tpu.parallel.hosts import initialize_distributed, slice_mesh

    ok = initialize_distributed(
        coordinator_address=sys.argv[1],
        num_processes=int(sys.argv[2]),
        process_id=int(sys.argv[3]),
    )
    assert ok, "explicit initialize returned False"
    assert jax.process_count() == int(sys.argv[2]), jax.process_count()
    mesh = slice_mesh()
    assert mesh.devices.size == jax.device_count()
    print("OK", jax.process_count(), jax.device_count())
    """
)


def test_initialize_distributed_two_processes():
    """2-process jax.distributed.initialize over localhost (CPU)."""
    addr = f"127.0.0.1:{_free_port()}"
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, addr, "2", str(i)],
            stdout=subprocess.PIPE,
            stderr=subprocess.PIPE,
            text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=120)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed init timed out")
        outs.append((p.returncode, out, err))
    for rc, out, err in outs:
        assert rc == 0, f"worker failed:\n{out}\n{err}"
        assert "OK 2" in out


def test_initialize_distributed_auto_fallback_single_process():
    """No-arg auto-detection on a plain host returns False, never raises."""
    code = textwrap.dedent(
        """
        import jax
        jax.config.update("jax_platforms", "cpu")
        from raytracer_tpu.parallel.hosts import initialize_distributed
        ok = initialize_distributed()
        print("RESULT", ok, jax.process_count())
        """
    )
    res = subprocess.run(
        [sys.executable, "-c", code],
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert res.returncode == 0, res.stderr
    # Either auto-detection succeeded as a 1-process "cluster" or it fell
    # back cleanly — both are fine; what must not happen is an exception.
    assert "RESULT" in res.stdout
