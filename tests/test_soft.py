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
