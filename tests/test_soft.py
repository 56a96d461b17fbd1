"""Soft-visibility renderer: hard-limit convergence, gradient correctness,
and end-to-end geometry recovery (SURVEY.md §4(c): finite-difference checks).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from raytracer_tpu.diff import render_soft
from raytracer_tpu.models.scenes import (
    grid_sphere_scene,
    reference_demo_camera,
    reference_demo_scene,
)
from raytracer_tpu.render.integrator import render

W, H = 64, 48


@pytest.fixture(scope="module")
def cam():
    return reference_demo_camera()


def test_soft_converges_to_hard(cam):
    """tau -> 0 must reproduce the hard render away from silhouettes."""
    scene = reference_demo_scene()
    hard = np.asarray(render(scene, cam, W, H, depth=0, tonemap=False))
    soft = np.asarray(
        render_soft(scene, cam, W, H, tau=0.001, tau_z=0.02, tonemap=False)
    )
    close = np.abs(soft - hard).max(axis=-1) < 3e-2
    assert close.mean() > 0.99
    assert np.isfinite(soft).all()


@pytest.mark.parametrize("param,delta", [("center", 0.05), ("radius", 0.03)])
def test_soft_gradients_match_finite_differences(cam, param, delta):
    scene = grid_sphere_scene(4, distance=4.0)
    target = render_soft(scene, cam, W, H, tau=0.02, tonemap=False)

    def loss(x):
        if param == "center":
            spheres = scene.spheres.replace(
                center=scene.spheres.center.at[0, 1].add(x)
            )
        else:
            spheres = scene.spheres.replace(radius=scene.spheres.radius + x)
        img = render_soft(
            scene.replace(spheres=spheres), cam, W, H, tau=0.02, tonemap=False
        )
        return jnp.mean((img - target) ** 2)

    g = float(jax.grad(loss)(delta))
    h = 1e-3
    fd = float((loss(delta + h) - loss(delta - h)) / (2 * h))
    assert np.isfinite(g) and np.isfinite(fd)
    assert abs(g - fd) <= 0.05 * max(abs(fd), 1e-6), (g, fd)


def test_soft_geometry_fit_recovers_centers(cam):
    """The capability hard visibility lacks: silhouette-driven center fits."""
    truth = grid_sphere_scene(4, distance=4.0)
    target = render_soft(truth, cam, W, H, tau=0.01, tonemap=False)
    rng = np.random.default_rng(0)
    pert = jnp.asarray(rng.uniform(-0.15, 0.15, (4, 3)), jnp.float32)
    params = {"center": truth.spheres.center + pert}
    opt = optax.adam(2e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            s2 = truth.replace(spheres=truth.spheres.replace(center=p["center"]))
            img = render_soft(s2, cam, W, H, tau=0.01, tonemap=False)
            return jnp.mean((img - target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        u, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, u), opt_state, loss

    err0 = float(jnp.abs(pert).mean())
    for _ in range(80):
        params, opt_state, loss = step(params, opt_state)
    err = float(jnp.abs(params["center"] - truth.spheres.center).mean())
    assert err < 0.35 * err0, (err0, err)
    assert np.isfinite(float(loss))


def test_soft_empty_scene_is_sky(cam):
    from raytracer_tpu.core.types import Scene

    scene = Scene.create()
    soft = np.asarray(render_soft(scene, cam, W, H, tonemap=False))
    hard = np.asarray(render(scene, cam, W, H, depth=0, tonemap=False))
    np.testing.assert_allclose(soft, hard, atol=1e-6)


# ---------------------------------------------------------------------------
# Soft reflections (depth > 0): the reference's defining recursive feature
# (main.cpp:89-119) made differentiable (VERDICT r1 item 3).
# ---------------------------------------------------------------------------


def _mirror_scene(sphere_center=(-2.0, 0.0, 0.0), metallic_wall=0.95):
    """A sphere visible ONLY via a mirror: camera rays fly toward +x (the
    reference direction-flip), hit a near-perfect mirror wall at x=4, and
    reflect back to a sphere behind the camera."""
    from raytracer_tpu.core.types import Lights, Materials, Scene, Sky, Spheres, Walls

    spheres = Spheres.create(
        center=[list(sphere_center)],
        radius=[0.8],
        material=Materials.create(color=[[0.9, 0.2, 0.1]], metallic=0.0),
    )
    walls = Walls.create(
        position=[[4.0, -3.0, -3.0]],
        normal=[[-1.0, 0.0, 0.0]],
        length=[6.0],
        width=[6.0],
        material=Materials.create(
            color=[[1.0, 1.0, 1.0]], metallic=metallic_wall
        ),
    )
    lights = Lights.create(
        point_position=[(0.0, 0.0, 0.0)], point_color=[(1.0, 1.0, 1.0)]
    )
    return Scene.create(
        spheres=spheres, walls=walls, lights=lights, sky=Sky.create()
    )


def test_soft_reflections_converge_to_hard(cam):
    """tau -> 0 at depth >= 1 must reproduce the hard bounce loop."""
    scene = reference_demo_scene()
    for depth in (1, 2):
        hard = np.asarray(render(scene, cam, W, H, depth=depth, tonemap=False))
        soft = np.asarray(
            render_soft(
                scene, cam, W, H, tau=0.001, tau_z=0.02, tonemap=False,
                depth=depth,
            )
        )
        close = np.abs(soft - hard).max(axis=-1) < 3e-2
        assert close.mean() > 0.99, (depth, close.mean())
        assert np.isfinite(soft).all()


def test_soft_bounce_gradients_match_fd(cam):
    """FD agreement for a parameter whose ONLY image influence is through
    the reflection bounce (the sphere is behind the camera)."""
    scene = _mirror_scene()
    target = render_soft(scene, cam, W, H, tau=0.02, tonemap=False, depth=1)

    def loss(x):
        spheres = scene.spheres.replace(
            center=scene.spheres.center.at[0, 1].add(x)
        )
        img = render_soft(
            scene.replace(spheres=spheres), cam, W, H, tau=0.02,
            tonemap=False, depth=1,
        )
        return jnp.mean((img - target) ** 2)

    delta = 0.07
    g = float(jax.grad(loss)(delta))
    h = 1e-3
    fd = float((loss(delta + h) - loss(delta - h)) / (2 * h))
    assert np.isfinite(g) and np.isfinite(fd)
    assert abs(fd) > 1e-7  # the bounce really carries signal
    assert abs(g - fd) <= 0.05 * max(abs(fd), 1e-6), (g, fd)


def test_soft_fit_recovers_mirror_hidden_sphere_from_hard_target(cam):
    """Inverse rendering through a bounce, against a HARD-rendered target:
    recover the center of a sphere the camera only ever sees in a mirror."""
    truth = _mirror_scene()
    target = render(truth, cam, W, H, depth=1, tonemap=False)

    pert = jnp.asarray([[0.0, 0.25, -0.2]], jnp.float32)
    params = {"center": truth.spheres.center + pert}
    opt = optax.adam(3e-2)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            s2 = truth.replace(spheres=truth.spheres.replace(center=p["center"]))
            img = render_soft(
                s2, cam, W, H, tau=0.01, tonemap=False, depth=1
            )
            return jnp.mean((img - target) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(params)
        u, opt_state = opt.update(g, opt_state, params)
        return optax.apply_updates(params, u), opt_state, loss

    err0 = float(jnp.abs(pert).mean())
    for _ in range(80):
        params, opt_state, loss = step(params, opt_state)
    err = float(jnp.abs(params["center"] - truth.spheres.center).mean())
    assert err < 0.4 * err0, (err0, err)
    assert np.isfinite(float(loss))


def test_make_fit_step_honors_depth_when_soft(cam):
    """make_fit_step(soft=True, depth=1) must see reflections: one step on
    the mirror scene produces a nonzero center gradient."""
    from raytracer_tpu.parallel.train import make_fit_step

    truth = _mirror_scene()
    target = render(truth, cam, W, H, depth=1, tonemap=True)
    init_fn, step_fn = make_fit_step(
        W, H, depth=1, soft=True, soft_tau=0.01,
        params_fn=lambda s: {"center": s.spheres.center},
    )
    pert = truth.replace(
        spheres=truth.spheres.replace(
            center=truth.spheres.center + jnp.asarray([[0.0, 0.2, 0.0]])
        )
    )
    state = init_fn(pert)
    state2, loss = step_fn(state, pert, cam, target)
    moved = float(jnp.abs(state2.params["center"] - state.params["center"]).max())
    assert moved > 1e-4, moved  # gradient flowed through the bounce
    assert np.isfinite(float(loss))
