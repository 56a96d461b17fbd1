"""Sharded rendering and distributed fit, on the 8-virtual-device CPU mesh.

SURVEY.md §4(d): multi-chip logic is tested without a pod via
``--xla_force_host_platform_device_count=8`` (set in conftest.py). The
invariant is exactness: sharding the pixel grid and/or the primitive axis
must not change a single pixel vs the single-device renderer.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.models.scenes import (
    grid_sphere_scene,
    reference_demo_camera,
    reference_demo_scene,
)
from raytracer_tpu.parallel import make_fit_step, make_mesh, render_sharded
from raytracer_tpu.render.integrator import render

W, H = 40, 24  # tiny: CPU-compile-time-bound tests


@pytest.fixture(scope="module")
def demo():
    return reference_demo_scene(), reference_demo_camera()


@pytest.mark.parametrize("px,prim", [(8, 1), (4, 2), (2, 4)])
def test_sharded_matches_single_device(demo, px, prim):
    scene, camera = demo
    ref = render(scene, camera, W, H, depth=2)
    mesh = make_mesh(px=px, prim=prim)
    img = render_sharded(scene, camera, W, H, mesh=mesh, depth=2)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=1e-6)


@pytest.mark.parametrize("px,prim", [(8, 1), (4, 2)])
def test_sharded_pallas_fold_matches_single_device(px, prim):
    """The Pallas megakernel engine runs UNDER the mesh (round-2 VERDICT
    item 4): fold="pallas" inside shard_map (interpret mode on CPU) must
    reproduce the single-device pallas render exactly. check_vma=False on
    the shard_map is what admits pallas_call per shard."""
    scene = grid_sphere_scene(8, distance=4.0)
    camera = reference_demo_camera()
    ref = render(scene, camera, W, H, depth=2, fold="pallas")
    mesh = make_mesh(px=px, prim=prim)
    img = render_sharded(
        scene, camera, W, H, mesh=mesh, depth=2, fold="pallas"
    )
    # px-only sharding reuses the identical megakernel per shard (exact);
    # prim sharding routes through the per-shard hit kernel + O(record)
    # combine, whose FMA fusion differs at f32 — BASELINE tolerance 1e-4.
    atol = 1e-6 if prim == 1 else 1e-4
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=atol)


def test_sharded_pallas_gradients_match_single_device():
    """Gradients through the mesh-sharded megakernel (forward + backward
    trace kernels under shard_map, interpret mode) == single-device."""
    scene = grid_sphere_scene(8, distance=4.0)
    camera = reference_demo_camera()
    mesh = make_mesh(px=8, prim=1)

    def loss(c, sharded):
        s2 = scene.replace(spheres=scene.spheres.replace(center=c))
        if sharded:
            img = render_sharded(
                s2, camera, W, H, mesh=mesh, depth=1, fold="pallas"
            )
        else:
            img = render(s2, camera, W, H, depth=1, fold="pallas")
        return jnp.mean(img ** 2)

    g1 = jax.grad(lambda c: loss(c, False))(scene.spheres.center)
    g8 = jax.grad(lambda c: loss(c, True))(scene.spheres.center)
    assert bool(jnp.isfinite(g8).all())
    np.testing.assert_allclose(
        np.asarray(g8), np.asarray(g1),
        atol=1e-5 * float(jnp.abs(g1).max()),
    )


def test_sharded_uneven_rows(demo):
    """Height not divisible by the px axis: pad rows must crop away exactly."""
    scene, camera = demo
    h = 21
    ref = render(scene, camera, W, h, depth=1)
    mesh = make_mesh(px=8, prim=1)
    img = render_sharded(scene, camera, W, h, mesh=mesh, depth=1)
    assert img.shape == (h, W, 3)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=1e-6)


def test_sharded_prim_padding():
    """Sphere count not divisible by the prim axis: never-hit padding."""
    scene = grid_sphere_scene(5, distance=4.0)
    camera = reference_demo_camera()
    ref = render(scene, camera, W, H, depth=1)
    mesh = make_mesh(px=2, prim=4)
    img = render_sharded(scene, camera, W, H, mesh=mesh, depth=1)
    np.testing.assert_allclose(np.asarray(img), np.asarray(ref), atol=1e-6)


def test_distributed_fit_gradients_match_single_device():
    """The mesh fit step's psum'd gradients == single-device gradients."""
    scene = grid_sphere_scene(4, distance=4.0)
    camera = reference_demo_camera()
    target = render(scene, camera, W, H, depth=1)
    # Perturb so gradients are nonzero.
    perturbed = scene.replace(
        spheres=scene.spheres.replace(center=scene.spheres.center + 0.1)
    )

    mesh = make_mesh(px=4, prim=2)
    init_m, step_m = make_fit_step(W, H, mesh=mesh, depth=1)
    init_s, step_s = make_fit_step(W, H, mesh=None, depth=1)

    st_m, loss_m = step_m(init_m(perturbed), perturbed, camera, target)
    st_s, loss_s = step_s(init_s(perturbed), perturbed, camera, target)

    np.testing.assert_allclose(float(loss_m), float(loss_s), rtol=1e-5)
    jax.tree_util.tree_map(
        lambda a, b: (
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5),
            # assert_allclose treats NaN == NaN as equal; rule NaNs out.
            np.testing.assert_equal(np.isfinite(np.asarray(a)).all(), True),
        ),
        st_m.params,
        st_s.params,
    )


def test_fit_reduces_loss():
    """Color-only fit: well-posed for hard-visibility gradients.

    (Geometry fits need the soft-intersection path — diff/ — because hard
    argmin visibility has zero gradient at silhouettes, SURVEY.md §7.)
    """
    scene = grid_sphere_scene(4, distance=4.0)
    camera = reference_demo_camera()
    target = render(scene, camera, W, H, depth=1)
    colors = scene.spheres.material.color
    perturbed = scene.replace(
        spheres=scene.spheres.replace(
            material=scene.spheres.material.replace(
                color=jnp.clip(colors + 0.3, 0.0, 1.0)
            )
        )
    )
    init_fn, step_fn = make_fit_step(
        W,
        H,
        depth=1,
        learning_rate=3e-2,
        params_fn=lambda s: {"color": s.spheres.material.color},
    )
    state = init_fn(perturbed)
    losses = []
    for _ in range(10):
        state, loss = step_fn(state, perturbed, camera, target)
        losses.append(float(loss))
    assert losses[-1] < losses[0]
    assert np.isfinite(losses).all()


def test_distributed_soft_fit_matches_single_device():
    """Sharded soft (geometry) fit: psum'd grads == single-device grads."""
    scene = grid_sphere_scene(4, distance=4.0)
    camera = reference_demo_camera()
    from raytracer_tpu.diff import render_soft

    target = render_soft(scene, camera, W, H, tau=0.02, tonemap=False)
    perturbed = scene.replace(
        spheres=scene.spheres.replace(center=scene.spheres.center + 0.1)
    )
    mesh = make_mesh(px=4, prim=2)
    init_m, step_m = make_fit_step(
        W, H, mesh=mesh, soft=True, soft_tau=0.02, tonemap=False
    )
    init_s, step_s = make_fit_step(
        W, H, mesh=None, soft=True, soft_tau=0.02, tonemap=False
    )
    st_m, loss_m = step_m(init_m(perturbed), perturbed, camera, target)
    st_s, loss_s = step_s(init_s(perturbed), perturbed, camera, target)
    np.testing.assert_allclose(float(loss_m), float(loss_s), rtol=1e-4)
    jax.tree_util.tree_map(
        lambda a, b: (
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5
            ),
            np.testing.assert_equal(np.isfinite(np.asarray(a)).all(), True),
        ),
        st_m.params,
        st_s.params,
    )
