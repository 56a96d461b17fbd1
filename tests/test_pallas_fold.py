"""Pallas closest-hit megakernel vs the jnp fold (interpret mode on CPU;
the real-TPU path is exercised by bench.py and the verify drive)."""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.models.scenes import (
    grid_sphere_scene,
    reference_demo_camera,
    reference_demo_scene,
)
from raytracer_tpu.ops.pallas_fold import fold_closest_pallas
from raytracer_tpu.ops.trace import fold_closest_jnp, raygen_tile


@pytest.mark.parametrize(
    "scene_fn",
    [
        reference_demo_scene,
        lambda: grid_sphere_scene(5, distance=4.0),  # non-multiple of unroll
        lambda: grid_sphere_scene(24, distance=6.0),
    ],
)
def test_pallas_fold_matches_jnp(scene_fn):
    scene = scene_fn()
    cam = reference_demo_camera()
    o, d = raygen_tile(cam, 96, 60)
    bt0, bi0 = fold_closest_jnp(scene, o, d)
    bt1, bi1 = fold_closest_pallas(scene, o, d, interpret=True)
    assert float((np.asarray(bi0) == np.asarray(bi1)).mean()) > 0.999
    hit = np.asarray(bt0) < 1e29
    np.testing.assert_allclose(
        np.asarray(bt1)[hit], np.asarray(bt0)[hit], rtol=1e-4, atol=1e-4
    )


def test_pallas_fold_walls_only():
    from raytracer_tpu.core.types import Materials, Scene, Walls

    walls = Walls.create(
        position=[[3.0, 2.0, 0.0], [3.0, -3.0, 0.0]],
        normal=[[0.0, -1.0, 0.0], [0.0, 1.0, 0.0]],
        length=[1.0, 2.0],
        width=[1.0, 2.0],
        material=Materials.create([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]),
    )
    scene = Scene.create(walls=walls)
    cam = reference_demo_camera()
    o, d = raygen_tile(cam, 64, 48)
    bt0, bi0 = fold_closest_jnp(scene, o, d)
    bt1, bi1 = fold_closest_pallas(scene, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(bi0), np.asarray(bi1))


def test_pallas_cull_fold_matches_jnp():
    """The tile-culling kernel is bit-compatible (conservative culling)."""
    from raytracer_tpu.ops.pallas_fold import fold_closest_pallas_cull

    scene = grid_sphere_scene(40, distance=6.0)
    cam = reference_demo_camera()
    o, d = raygen_tile(cam, 96, 60)
    bt0, bi0 = fold_closest_jnp(scene, o, d)
    bt1, bi1 = fold_closest_pallas_cull(scene, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(bi0), np.asarray(bi1))
    hit = np.asarray(bt0) < 1e29
    np.testing.assert_allclose(
        np.asarray(bt1)[hit], np.asarray(bt0)[hit], rtol=1e-4, atol=1e-4
    )


@pytest.mark.parametrize(
    "scene_fn",
    [
        reference_demo_scene,
        lambda: grid_sphere_scene(5, distance=4.0),
        lambda: grid_sphere_scene(40, distance=6.0),
        lambda: grid_sphere_scene(130, distance=8.0),  # chunk-scan sizes
    ],
)
def test_pallas_shortlist_fold_matches_jnp(scene_fn):
    """The shortlist kernel is bit-compatible (culling is conservative)."""
    from raytracer_tpu.ops.pallas_fold import fold_closest_pallas_shortlist

    scene = scene_fn()
    cam = reference_demo_camera()
    o, d = raygen_tile(cam, 96, 60)
    bt0, bi0 = fold_closest_jnp(scene, o, d)
    bt1, bi1 = fold_closest_pallas_shortlist(scene, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(bi0), np.asarray(bi1))
    hit = np.asarray(bt0) < 1e29
    np.testing.assert_allclose(
        np.asarray(bt1)[hit], np.asarray(bt0)[hit], rtol=1e-4, atol=1e-4
    )


def test_pallas_shortlist_incoherent_rays_and_mask():
    """Divergent (bounce-like) rays with an active mask: active lanes exact,
    inactive lanes miss cleanly."""
    from raytracer_tpu.core.v3 import V3
    from raytracer_tpu.ops.pallas_fold import fold_closest_pallas_shortlist

    scene = grid_sphere_scene(64, distance=5.0)
    rng = np.random.default_rng(11)
    shape = (60, 96)
    o = V3(*[jnp.asarray(rng.uniform(-1, 6, shape), jnp.float32) for _ in range(3)])
    dd = rng.standard_normal((3,) + shape).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=0, keepdims=True)
    d = V3(*[jnp.asarray(c) for c in dd])
    mask = jnp.asarray(rng.uniform(size=shape) < 0.6)

    bt0, bi0 = fold_closest_jnp(scene, o, d)
    bt1, bi1 = fold_closest_pallas_shortlist(
        scene, o, d, active=mask, interpret=True
    )
    m = np.asarray(mask)
    np.testing.assert_array_equal(np.asarray(bi0)[m], np.asarray(bi1)[m])
    hit = (np.asarray(bt0) < 1e29) & m
    np.testing.assert_allclose(
        np.asarray(bt1)[hit], np.asarray(bt0)[hit], rtol=1e-4, atol=1e-4
    )
    # Inactive lanes: arbitrary but clean (miss sentinel or a real record).
    assert np.isfinite(np.asarray(bt1)).all()


def test_pallas_shortlist_walls_only_and_all_dead():
    from raytracer_tpu.core.types import Materials, Scene, Walls
    from raytracer_tpu.core.v3 import V3
    from raytracer_tpu.ops.pallas_fold import fold_closest_pallas_shortlist

    walls = Walls.create(
        position=[[3.0, 2.0, 0.0]],
        normal=[[0.0, -1.0, 0.0]],
        length=[4.0],
        width=[4.0],
        material=Materials.create([[1.0, 0.0, 0.0]]),
    )
    scene = Scene.create(walls=walls)
    cam = reference_demo_camera()
    o, d = raygen_tile(cam, 64, 48)
    bt0, bi0 = fold_closest_jnp(scene, o, d)
    bt1, bi1 = fold_closest_pallas_shortlist(scene, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(bi0), np.asarray(bi1))

    # Fully dead mask: every lane returns the miss sentinel.
    dead = jnp.zeros(bt0.shape, bool)
    bt2, bi2 = fold_closest_pallas_shortlist(
        scene, o, d, active=dead, interpret=True
    )
    assert (np.asarray(bi2) == -1).all()


def test_render_shortlist_fold_matches_jnp_render():
    """Integrator-level equivalence: fold='pallas' == fold='jnp' with the
    bounce-loop active masking in play."""
    from raytracer_tpu.render.integrator import render

    scene = grid_sphere_scene(40, distance=6.0)
    cam = reference_demo_camera()
    img0 = render(scene, cam, 96, 60, depth=2, fold="jnp")
    img1 = render(scene, cam, 96, 60, depth=2, fold="pallas")
    np.testing.assert_allclose(
        np.asarray(img1), np.asarray(img0), rtol=2e-4, atol=2e-4
    )
