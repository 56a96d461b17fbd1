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
