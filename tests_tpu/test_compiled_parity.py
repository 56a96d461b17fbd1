"""Compiled (interpret=False) kernel parity on the real TPU.

Small shapes keep each compile ~10-40 s; assertions mirror the CPU
suite's (tests/test_pallas_fold.py, tests/test_pallas_soft.py) but
against Mosaic-compiled kernels — the class of regression bench.py would
otherwise be the only thing to catch.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.models.scenes import (
    grid_sphere_scene,
    mixed_primitive_scene,
    reference_demo_camera,
)
from raytracer_tpu.ops.trace import raygen_tile

W, H = 256, 128  # small: compile-bound lane, keep it quick


@pytest.fixture(scope="module")
def rays():
    return raygen_tile(reference_demo_camera(), W, H)


def test_compiled_hard_fold_matches_jnp(rays):
    """Shortlist megakernel fold == brute-force jnp fold (t AND index):
    the culling invariant (conservative discards + index tie-break) holds
    under Mosaic compilation, not just interpret mode."""
    from raytracer_tpu.ops.pallas_fold import fold_closest_pallas_shortlist
    from raytracer_tpu.ops.trace import fold_closest_jnp

    o, d = rays
    for scene in (grid_sphere_scene(64), mixed_primitive_scene()):
        bt, bi = jax.jit(
            lambda s, oo, dd: fold_closest_pallas_shortlist(
                s, oo, dd, interpret=False
            )
        )(scene, o, d)
        wt, wi = jax.jit(fold_closest_jnp)(scene, o, d)
        np.testing.assert_allclose(
            np.asarray(bt), np.asarray(wt), rtol=1e-6, atol=1e-6
        )
        np.testing.assert_array_equal(np.asarray(bi), np.asarray(wi))


def test_compiled_trace_forward_matches_xla(rays):
    """Whole-trace megakernel forward == XLA per-level pipeline."""
    from raytracer_tpu.render.integrator import render

    scene = grid_sphere_scene(64)
    cam = reference_demo_camera()
    img_k = np.asarray(render(scene, cam, W, H, depth=2, fold="pallas"))
    img_x = np.asarray(render(scene, cam, W, H, depth=2, fold="jnp"))
    np.testing.assert_allclose(img_k, img_x, rtol=2e-4, atol=2e-4)


def test_compiled_trace_backward_matches_xla(rays):
    """Hard-path training gradients through the compiled backward trace
    megakernel == the jnp path's (same selections, same `_level_math`)."""
    from raytracer_tpu.render.integrator import render

    scene = grid_sphere_scene(64)
    cam = reference_demo_camera()
    tgt = jnp.zeros((H, W, 3), jnp.float32)

    def loss(c, fold):
        sc = scene.replace(spheres=scene.spheres.replace(center=c))
        img = render(sc, cam, W, H, depth=2, fold=fold)
        return jnp.mean((img - tgt) ** 2)

    c0 = scene.spheres.center
    gk = np.asarray(jax.grad(lambda c: loss(c, "pallas"))(c0))
    gx = np.asarray(jax.grad(lambda c: loss(c, "jnp"))(c0))
    assert np.isfinite(gk).all()
    # Same bar as tests/test_pallas_fold.py's backward parity: the two
    # paths gather winner attributes differently (in-kernel scatter vs
    # one-hot matmul), so per-element f32 reassociation is expected.
    np.testing.assert_allclose(gk, gx, atol=1e-2 * np.abs(gx).max())


def test_compiled_fused_backward_demo_class(rays):
    """The round-5 FUSED whole-trace backward on the single-chunk (demo /
    c3) scene class, compiled: (a) every scene-leaf gradient is finite and
    matches the XLA path at the established 1e-2 bar under an MSE loss;
    (b) the fused sweep is BIT-IDENTICAL to the per-level backward chain
    it replaced (same kernels' math, one dispatch — measured identical to
    every printed digit on the v5e, pinned here). Uses sprint3 (sun +
    walls + sphere) at depth 3 so the sun/sky cotangent packing and the
    dead-sky-tile level skip both execute compiled."""
    from raytracer_tpu.models.scenes import sprint3_scene
    from raytracer_tpu.ops import pallas_fold as pf
    from raytracer_tpu.render.integrator import render

    scene = sprint3_scene()
    cam = reference_demo_camera()
    tgt = jnp.zeros((H, W, 3), jnp.float32)

    def loss(s, fold):
        img = render(s, cam, W, H, depth=3, fold=fold, tonemap=True)
        return jnp.mean((img - tgt) ** 2)

    g_fused = jax.grad(lambda s: loss(s, "pallas"))(scene)
    g_xla = jax.grad(lambda s: loss(s, "jnp"))(scene)
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_fused),
        jax.tree_util.tree_leaves(g_xla),
    ):
        if not hasattr(a, "dtype") or a.dtype != jnp.float32 or not a.size:
            continue
        assert bool(jnp.isfinite(a).all()), path
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b),
            atol=1e-2 * max(float(jnp.max(jnp.abs(b))), 1e-8),
            err_msg=str(path),
        )

    import unittest.mock as mock

    with mock.patch.object(pf, "_FUSED_BWD", False):
        jax.clear_caches()
        g_pl = jax.grad(lambda s: loss(s, "pallas"))(scene)
    jax.clear_caches()
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(g_fused),
        jax.tree_util.tree_leaves(g_pl),
    ):
        if not hasattr(a, "dtype") or a.dtype != jnp.float32 or not a.size:
            continue
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6,
            atol=1e-7 * max(float(jnp.max(jnp.abs(b))), 1e-8),
            err_msg=str(path),
        )


def test_compiled_camera_gradients_finite_and_match(rays):
    """Camera gradients flow through the backward kernels' RAY cotangents
    (ct_o/ct_d -> raygen transpose) — the channel the round-4 miss-lane
    0*inf NaN poisoned. XLA's simplifier hid the NaN on the jnp path;
    this pins the compiled kernel path at the same values."""
    from raytracer_tpu.models.scenes import reference_demo_camera
    from raytracer_tpu.render.integrator import render

    scene = grid_sphere_scene(16)
    cam = reference_demo_camera()
    tgt = jnp.zeros((H, W, 3), jnp.float32)

    def loss(vfov, pos, fold):
        c = cam.replace(vfov=vfov, position=pos)
        img = render(scene, c, W, H, depth=1, fold=fold)
        return jnp.mean((img - tgt) ** 2)

    args = (cam.vfov, cam.position)
    gk = jax.grad(lambda v, p: loss(v, p, "pallas"), argnums=(0, 1))(*args)
    gx = jax.grad(lambda v, p: loss(v, p, "jnp"), argnums=(0, 1))(*args)
    for a, b in zip(jax.tree_util.tree_leaves(gk),
                    jax.tree_util.tree_leaves(gx)):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all()
        np.testing.assert_allclose(
            a, b, atol=1e-2 * max(np.abs(b).max(), 1e-10)
        )


def test_compiled_soft_forward_and_grads(rays):
    """Soft megakernels (compiled): forward == XLA soft compositor;
    color gradients tight; geometry gradients kink-robust (cosine/L2 —
    the anchored depth softmax's subgradient ambiguity flips sides
    between evaluation engines; see tests/test_pallas_soft.py)."""
    from raytracer_tpu.diff.soft import trace_soft
    from raytracer_tpu.ops import pallas_soft as ps

    # 24 spheres = 3 chunks: the scene-adaptive AABB chunk gate (round 5)
    # compiles and must stay exact — 1-chunk scenes take the bounding-
    # sphere branch and would leave the aabb slab gate Mosaic-untested.
    scene = grid_sphere_scene(24, distance=5.0)
    assert ps._soft_gate_kind(ps._n_s_pad(scene) // ps._SOFT_CHUNK) == "aabb"
    o, d = rays
    TAU, TAU_Z = jnp.float32(0.02), jnp.float32(0.05)

    got = np.asarray(
        ps.soft_trace_pallas(scene, o, d, TAU, TAU_Z, 1).stacked()
    )
    want = np.asarray(
        trace_soft(
            scene.replace(), o, d, tau=float(TAU), tau_z=float(TAU_Z),
            depth=1,
        ).stacked()
        if not ps.soft_pallas_supported(scene)
        else _xla_soft(scene, o, d, float(TAU), float(TAU_Z))
    )
    np.testing.assert_allclose(got, want, atol=3e-4, rtol=3e-4)

    tgt = jnp.zeros((H, W, 3), jnp.float32)

    def loss_k(c):
        sc = scene.replace(spheres=scene.spheres.replace(center=c))
        img = ps.soft_trace_pallas(sc, o, d, TAU, TAU_Z, 1)
        return jnp.mean((img.stacked() - tgt) ** 2)

    def loss_x(c):
        sc = scene.replace(spheres=scene.spheres.replace(center=c))
        return jnp.mean((_xla_soft_j(sc, o, d, TAU, TAU_Z) - tgt) ** 2)

    gk = np.asarray(jax.grad(loss_k)(scene.spheres.center)).ravel()
    gx = np.asarray(jax.grad(loss_x)(scene.spheres.center)).ravel()
    assert np.isfinite(gk).all()
    cos = float((gk * gx).sum() / (np.linalg.norm(gk) * np.linalg.norm(gx)))
    assert cos > 0.99, cos
    assert np.linalg.norm(gk - gx) <= 0.15 * np.linalg.norm(gx)


def _xla_soft(scene, o, d, tau, tau_z):
    """trace_soft forced onto the XLA path (kernel auto-select disabled)."""
    from raytracer_tpu.diff.soft import trace_soft
    from raytracer_tpu.ops import pallas_soft as ps

    prev = ps._SOFT_PALLAS
    ps._SOFT_PALLAS = False
    try:
        return np.asarray(
            trace_soft(scene, o, d, tau=tau, tau_z=tau_z, depth=1).stacked()
        )
    finally:
        ps._SOFT_PALLAS = prev


def _xla_soft_j(scene, o, d, tau, tau_z):
    from raytracer_tpu.diff.soft import trace_soft
    from raytracer_tpu.ops import pallas_soft as ps

    prev = ps._SOFT_PALLAS
    ps._SOFT_PALLAS = False
    try:
        return trace_soft(
            scene, o, d, tau=float(tau), tau_z=float(tau_z), depth=1
        ).stacked()
    finally:
        ps._SOFT_PALLAS = prev
