"""Soft-path Pallas megakernels (ops/pallas_soft.py) vs the XLA soft path.

All kernel runs use interpret=True on the CPU harness (production compiles
them on the TPU; bench.py's fit_step_ms_c4 exercises that). Forward parity
is tight; gradient parity is checked with kink-robust metrics because the
anchored depth softmax has an inherent subgradient ambiguity: the anchor
primitive sits exactly at the max(t - t_ref, 0) kink (t == t_ref by
construction), and which side f32 evaluation lands on differs between
evaluation engines. Color gradients avoid the kink (they don't flow
through t) and must match tightly; finite differences anchor the kernel
path's own gradients.
"""

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.core.v3 import V3
from raytracer_tpu.diff.soft import trace_soft
from raytracer_tpu.models.scenes import (
    grid_sphere_scene,
    mixed_primitive_scene,
    reference_demo_camera,
)
from raytracer_tpu.ops import pallas_soft as ps
from raytracer_tpu.ops.trace import raygen_tile

W, H = 128, 64
TAU, TAU_Z = jnp.float32(0.02), jnp.float32(0.05)


def _rays():
    cam = reference_demo_camera()
    return raygen_tile(cam, W, H)


def test_soft_kernel_forward_matches_xla():
    """Per-level megakernel forward == trace_soft (front-to-back restructure
    is algebraically exact; tolerance is f32 reassociation)."""
    o, d = _rays()
    for scene, depths in (
        (grid_sphere_scene(4, distance=4.0), (0, 1)),
        (mixed_primitive_scene(), (1,)),  # spheres + walls + boxes
    ):
        for depth in depths:
            want = trace_soft(
                scene, o, d, tau=float(TAU), tau_z=float(TAU_Z), depth=depth
            )
            got = ps._soft_levels_impl(
                scene, o, d, TAU, TAU_Z, depth=depth, interpret=True
            )
            np.testing.assert_allclose(
                np.asarray(got.stacked()), np.asarray(want.stacked()),
                atol=2e-4, rtol=2e-4,
            )


def test_soft_kernel_color_gradients_match_xla():
    """Albedo gradients bypass the depth kink entirely -> tight parity."""
    scene = grid_sphere_scene(4, distance=4.0)
    o, d = _rays()
    tgt = jax.random.uniform(jax.random.PRNGKey(0), (H, W, 3))

    def loss(color, use_kernel):
        sc = scene.replace(spheres=scene.spheres.replace(
            material=scene.spheres.material.replace(color=color)))
        if use_kernel:
            img = ps.soft_trace_pallas(sc, o, d, TAU, TAU_Z, 1)
        else:
            img = trace_soft(sc, o, d, tau=float(TAU), tau_z=float(TAU_Z),
                             depth=1)
        return jnp.mean((img.stacked() - tgt) ** 2)

    c0 = scene.spheres.material.color
    gx = np.asarray(jax.grad(lambda c: loss(c, False))(c0))
    gk = np.asarray(jax.grad(lambda c: loss(c, True))(c0))
    np.testing.assert_allclose(gk, gx, atol=1e-4 * max(np.abs(gx).max(), 1.0))


def test_soft_kernel_geometry_gradients_aggregate_parity():
    """Center / ray-direction gradients: kink flips are confined to the
    anchor-coincident pixels, so aggregate direction must agree."""
    scene = grid_sphere_scene(4, distance=4.0)
    o, d = _rays()
    tgt = jax.random.uniform(jax.random.PRNGKey(0), (H, W, 3))

    def loss(center, dd, use_kernel):
        sc = scene.replace(spheres=scene.spheres.replace(center=center))
        if use_kernel:
            img = ps.soft_trace_pallas(sc, o, dd, TAU, TAU_Z, 1)
        else:
            img = trace_soft(sc, o, dd, tau=float(TAU), tau_z=float(TAU_Z),
                             depth=1)
        return jnp.mean((img.stacked() - tgt) ** 2)

    args = (scene.spheres.center, d)
    gx = jax.grad(lambda c, dd: loss(c, dd, False), argnums=(0, 1))(*args)
    gk = jax.grad(lambda c, dd: loss(c, dd, True), argnums=(0, 1))(*args)
    for a, b in ((gx[0], gk[0]), (gx[1].x, gk[1].x), (gx[1].z, gk[1].z)):
        a = np.asarray(a).ravel()
        b = np.asarray(b).ravel()
        cos = float((a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.99, cos
        assert np.linalg.norm(a - b) <= 0.15 * np.linalg.norm(a)


def test_soft_kernel_gradients_match_fd():
    """The kernel path's own gradients against finite differences (the
    same protocol as tests/test_soft.py's XLA FD test)."""
    scene = grid_sphere_scene(4, distance=4.0)
    o, d = _rays()
    target = ps._soft_levels_impl(
        scene, o, d, TAU, TAU_Z, depth=0, interpret=True
    ).stacked()

    def loss(x):
        spheres = scene.spheres.replace(
            center=scene.spheres.center.at[0, 1].add(x)
        )
        img = ps.soft_trace_pallas(
            scene.replace(spheres=spheres), o, d, TAU, TAU_Z, 0
        )
        return jnp.mean((img.stacked() - target) ** 2)

    delta = jnp.float32(0.05)
    g = float(jax.grad(loss)(delta))
    h = 1e-3
    fd = float((loss(delta + h) - loss(delta - h)) / (2 * h))
    assert np.isfinite(g) and np.isfinite(fd)
    assert abs(g - fd) <= 0.05 * max(abs(fd), 1e-6), (g, fd)


def test_sigmoid_underflow_margin_canary():
    """The soft tube gate's exactness rests on f32 sigmoid underflowing to
    EXACTLY 0.0 (value and gradient) past -_GATE_SIG_MARGIN. Pin that the
    margin keeps headroom over this engine's underflow point — if a jax
    upgrade changes the sigmoid lowering, this canary fires before the
    gates silently perturb fit gradients. (Mosaic's compiled form is
    pinned by the tests_tpu parity lane.)"""
    m = ps._GATE_SIG_MARGIN
    assert m >= 128.0  # 1.4x over the worst (exp-form) underflow at ~-89
    for x in (-m, -m * 2.0):
        xv = jnp.float32(x)
        assert float(jax.nn.sigmoid(xv)) == 0.0
        assert float(jax.grad(lambda v: jax.nn.sigmoid(v))(xv)) == 0.0
    assert ps._GATE_T_MARGIN >= 128.0


def test_soft_multi_plane_cotangent_slots(monkeypatch):
    """Sphere counts past one lane-slot plane (the old 1024 cliff, VERDICT
    r4 item 3) scatter their cotangents into ADDITIONAL (8, 128) planes.
    Exercised cheaply by shrinking _SLOT_CAP to 16 so a 24-sphere scene
    needs 2 planes; gradients must match the XLA soft path exactly as the
    single-plane layout does. clear_caches: _SLOT_CAP is read at trace
    time (CLAUDE.md cache trap)."""
    monkeypatch.setattr(ps, "_SLOT_CAP", 16)
    jax.clear_caches()
    try:
        scene = grid_sphere_scene(24, distance=5.0)
        assert ps._sct_planes(ps._n_s_pad(scene)) == 2
        o, d = _rays()
        tgt = jax.random.uniform(jax.random.PRNGKey(0), (H, W, 3))

        def loss(color, use_kernel):
            sc = scene.replace(spheres=scene.spheres.replace(
                material=scene.spheres.material.replace(color=color)))
            if use_kernel:
                img = ps.soft_trace_pallas(sc, o, d, TAU, TAU_Z, 0)
            else:
                img = trace_soft(sc, o, d, tau=float(TAU),
                                 tau_z=float(TAU_Z), depth=0)
            return jnp.mean((img.stacked() - tgt) ** 2)

        c0 = scene.spheres.material.color
        gx = np.asarray(jax.grad(lambda c: loss(c, False))(c0))
        gk = np.asarray(jax.grad(lambda c: loss(c, True))(c0))
        # Every sphere's color gradient (incl. spheres 16..23 on plane 2)
        # must land in the right slot.
        np.testing.assert_allclose(
            gk, gx, atol=1e-4 * max(np.abs(gx).max(), 1.0)
        )
    finally:
        jax.clear_caches()


def test_soft_kernel_supports_past_1024_spheres():
    """The kernel path no longer cliffs at 1024 spheres: a 1025-sphere
    scene routes to the megakernels (soft_pallas_supported True up to the
    carry-footprint cap), and the slot layout accounts for it."""
    scene = grid_sphere_scene(1025, distance=40.0)
    n_pad = ps._n_s_pad(scene)
    assert ps._sct_planes(n_pad) == 2
    assert len(scene.spheres) <= ps._SOFT_MAX_SPHERES
    # pallas_available() is False on the CPU harness; the support predicate
    # must be limited only by the backend, not the sphere count.
    if ps.pallas_available() or ps._FORCE_KERNEL:
        assert ps.soft_pallas_supported(scene)
    else:
        import unittest.mock as mock

        with mock.patch.object(ps, "_FORCE_KERNEL", True):
            assert ps.soft_pallas_supported(scene)


def test_soft_kernel_all_leaf_gradients_finite():
    """Every differentiable scene leaf (incl. walls, boxes, lights, sky)
    gets a finite cotangent through the kernel custom VJP."""
    scene = mixed_primitive_scene()
    o, d = _rays()

    def loss(sc):
        img = ps.soft_trace_pallas(sc, o, d, TAU, TAU_Z, 1)
        return jnp.mean(img.stacked())

    grads = jax.grad(loss)(scene)
    for path, leaf in jax.tree_util.tree_leaves_with_path(grads):
        if hasattr(leaf, "dtype") and leaf.dtype == jnp.float32:
            assert bool(jnp.isfinite(leaf).all()), path


def test_soft_kernel_runs_under_sharded_mesh(monkeypatch):
    """The soft megakernels run UNDER the device mesh (check_vma=False
    shard_map admits pallas_call per shard, exactly like the hard path):
    the px-sharded soft render through the kernel engine == the
    single-device kernel render, values and gradients."""
    from raytracer_tpu.parallel.mesh import make_mesh
    from raytracer_tpu.parallel.render import render_soft_sharded_impl

    monkeypatch.setattr(ps, "_FORCE_KERNEL", True)
    scene = grid_sphere_scene(4, distance=4.0)
    cam = reference_demo_camera()
    mesh = make_mesh(px=8, prim=1)

    from raytracer_tpu.diff.soft import render_soft

    ref = render_soft(scene, cam, W, H, tau=float(TAU), tau_z=float(TAU_Z),
                      tonemap=False, depth=1)
    img = render_soft_sharded_impl(
        scene, cam, W, H, mesh=mesh, tau=float(TAU), tau_z=float(TAU_Z),
        tonemap=False, depth=1,
    )
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=1e-6)

    def loss(c, sharded):
        sc = scene.replace(spheres=scene.spheres.replace(center=c))
        if sharded:
            out = render_soft_sharded_impl(
                sc, cam, W, H, mesh=mesh, tau=float(TAU),
                tau_z=float(TAU_Z), tonemap=False, depth=1,
            )
        else:
            out = render_soft(sc, cam, W, H, tau=float(TAU),
                              tau_z=float(TAU_Z), tonemap=False, depth=1)
        return jnp.mean(out ** 2)

    g1 = jax.grad(lambda c: loss(c, False))(scene.spheres.center)
    g8 = jax.grad(lambda c: loss(c, True))(scene.spheres.center)
    assert bool(jnp.isfinite(g8).all())
    np.testing.assert_allclose(
        np.asarray(g8), np.asarray(g1),
        atol=1e-5 * max(float(jnp.abs(g1).max()), 1e-8),
    )


def test_soft_sharded_folds_prim_into_px(monkeypatch):
    """On a mesh with prim > 1, the soft sharded render splits pixel rows
    over EVERY device — 'prim' shards get their own rows instead of
    recomputing identical tiles (VERDICT r4 item 7). Pins (a) per-shard row
    count = H / (px * prim), (b) exactness + gradient parity vs the
    unsharded render on a (2, 2) mesh."""
    from raytracer_tpu.diff.soft import render_soft
    from raytracer_tpu.parallel import render as pr
    from raytracer_tpu.parallel.mesh import make_mesh

    scene = grid_sphere_scene(4, distance=4.0)
    cam = reference_demo_camera()
    mesh = make_mesh(px=2, prim=2, devices=jax.devices()[:4])

    seen_rows = []
    real_raygen = pr.raygen_tile

    def spy_raygen(camera, width, height, **kw):
        seen_rows.append(kw.get("rows"))
        return real_raygen(camera, width, height, **kw)

    monkeypatch.setattr(pr, "raygen_tile", spy_raygen)
    img = pr.render_soft_sharded_impl(
        scene, cam, W, H, mesh=mesh, tau=float(TAU), tau_z=float(TAU_Z),
        tonemap=False, depth=1,
    )
    # Rows shard over all 4 devices, not just the 2 'px' shards.
    assert seen_rows == [-(-H // 4)], seen_rows

    ref = render_soft(scene, cam, W, H, tau=float(TAU), tau_z=float(TAU_Z),
                      tonemap=False, depth=1)
    # atol: the XLA soft path's sharded-vs-unsharded spread is ~6e-5
    # regardless of mesh shape (row-batch shape changes XLA fusion order);
    # the kernel engine is bit-stable and covered by the sibling test.
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=2e-4)

    def loss(c, sharded):
        sc = scene.replace(spheres=scene.spheres.replace(center=c))
        if sharded:
            out = pr.render_soft_sharded_impl(
                sc, cam, W, H, mesh=mesh, tau=float(TAU),
                tau_z=float(TAU_Z), tonemap=False, depth=1,
            )
        else:
            out = render_soft(sc, cam, W, H, tau=float(TAU),
                              tau_z=float(TAU_Z), tonemap=False, depth=1)
        return jnp.mean(out ** 2)

    g1 = jax.grad(lambda c: loss(c, False))(scene.spheres.center)
    g4 = jax.grad(lambda c: loss(c, True))(scene.spheres.center)
    assert bool(jnp.isfinite(g4).all())
    # Same XLA fusion-order spread as the forward (~0.25% relative); the
    # kernel engine's sharded gradients are pinned tight by the sibling
    # test above.
    np.testing.assert_allclose(
        np.asarray(g4), np.asarray(g1),
        atol=5e-3 * max(float(jnp.abs(g1).max()), 1e-8),
    )


def test_soft_kernel_fit_descends():
    """A miniature center fit through the kernel path reduces the loss
    (the c4 capability, kernel engine)."""
    import optax

    truth = grid_sphere_scene(4, distance=4.0)
    o, d = _rays()
    target = ps._soft_levels_impl(
        truth, o, d, TAU, TAU_Z, depth=1, interpret=True
    ).stacked()
    rng = np.random.default_rng(0)
    pert = jnp.asarray(rng.uniform(-0.1, 0.1, (4, 3)), jnp.float32)
    params = truth.spheres.center + pert
    opt = optax.adam(2e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(c):
            sc = truth.replace(spheres=truth.spheres.replace(center=c))
            img = ps.soft_trace_pallas(sc, o, d, TAU, TAU_Z, 1)
            return jnp.mean((img.stacked() - target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        u, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, u), opt_state, loss

    params, opt_state, loss0 = step(params, opt_state)
    for _ in range(6):
        params, opt_state, loss = step(params, opt_state)
    assert float(loss) < float(loss0)
    err0 = float(jnp.abs(pert).mean())
    err = float(jnp.abs(params - truth.spheres.center).mean())
    assert err < err0
