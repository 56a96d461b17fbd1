"""Profiler benchmarks: the 3-way fwd/train/bwd decomposition contract.

The timing VALUES are relay/hardware-dependent (bench.py territory); these
tests pin the measurement STRUCTURE on tiny CPU shapes — the keys the
driver artifact relies on, the paired-rounds bookkeeping, and that the
training-forward chain's residual-liveness probe builds (the guard against
XLA dead-code-eliminating the residuals, which would silently turn
forward_train_ms back into the pure forward).
"""

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.models.scenes import (
    reference_demo_camera,
    reference_demo_scene,
)
from raytracer_tpu.utils.profiler import (
    PhaseTimer,
    benchmark_forward_backward,
    benchmark_render,
)


def test_forward_backward_three_way_decomposition():
    scene = reference_demo_scene()
    cam = reference_demo_camera()
    r = benchmark_forward_backward(
        scene, cam, 48, 32, depth=1, iters=2, rounds=2
    )
    for k in (
        "forward_ms",
        "forward_train_ms",
        "forward_backward_ms",
        "backward_ms",
        "bwd_fwd_ratio",
        "fwdbwd_over_fwd",
    ):
        assert np.isfinite(r[k]) and r[k] >= 0, (k, r[k])
    # backward = median of the PER-ROUND paired (both - train) differences
    # (clamped at 0), not a difference of independent medians.
    import statistics

    paired = [
        max(b - t, 0.0)
        for b, t in zip(
            r["forward_backward_ms_rounds"], r["forward_train_ms_rounds"]
        )
    ]
    assert abs(r["backward_ms"] - statistics.median(paired)) < 1e-2
    # Paired per-round values are reported for the spread artifact.
    for k in (
        "bwd_fwd_ratio_rounds",
        "forward_ms_rounds",
        "forward_train_ms_rounds",
        "forward_backward_ms_rounds",
    ):
        assert len(r[k]) == 2, k


def test_train_forward_probe_keeps_residuals_live():
    """The vjp-closure probe must reference at least one residual leaf —
    if jax.vjp's closure stopped flattening to the residual arrays, the
    training-forward chain would silently DCE back to the pure forward."""
    from raytracer_tpu.render.integrator import render

    scene = reference_demo_scene()
    cam = reference_demo_camera()

    def loss(c):
        sc = scene.replace(spheres=scene.spheres.replace(center=c))
        return jnp.mean(render(sc, cam, 48, 32, depth=1) ** 2)

    _, vjp_fn = jax.vjp(loss, scene.spheres.center)
    leaves = [
        r for r in jax.tree_util.tree_leaves(vjp_fn)
        if hasattr(r, "dtype") and getattr(r, "size", 0)
    ]
    assert leaves, "vjp closure no longer exposes residual leaves"


def test_benchmark_render_contract():
    scene = reference_demo_scene()
    cam = reference_demo_camera()
    r = benchmark_render(scene, cam, 48, 32, depth=1, iters=2)
    assert r["pixels"] == 48 * 32
    assert np.isfinite(r["frame_ms"]) and r["frame_ms"] > 0
    assert r["primary_rays_per_s"] > 0


def test_benchmark_scaling_contract():
    """benchmark_scaling shards the same frame over growing device counts
    and reports efficiency vs linear scaling from the 1-device run."""
    from raytracer_tpu.utils.profiler import benchmark_scaling

    scene = reference_demo_scene()
    cam = reference_demo_camera()
    rows = benchmark_scaling(
        scene, cam, 64, 32, depth=0, iters=1, device_counts=[1, 2]
    )
    assert [r["devices"] for r in rows] == [1, 2]
    assert rows[0]["scaling_efficiency"] == 1.0
    for r in rows:
        assert np.isfinite(r["frame_ms"]) and r["frame_ms"] > 0
        assert r["primary_rays_per_s"] > 0
        assert r["scaling_efficiency"] > 0


def test_phase_timer_report_and_save(tmp_path):
    t = PhaseTimer()
    with t.phase("raytracing"):
        pass
    t.record("render", 0.002)
    rep = t.report()
    assert "raytracing" in rep and "render" in rep
    p = tmp_path / "frames.log"
    t.save(p)
    assert "per-frame seconds" in p.read_text()
