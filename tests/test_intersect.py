"""Intersection kernels vs the NumPy oracle + chunked-fold equivalence."""

import numpy as np
import jax.numpy as jnp

from raytracer_tpu.core.types import Materials, Scene, Spheres, Walls, Lights, Sky
from raytracer_tpu.models import scenes
from raytracer_tpu.ops import intersect
from raytracer_tpu.oracle import numpy_ref

def _rand_rays(p, seed=7):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2, 2, (p, 3)).astype(np.float32)
    d = rng.standard_normal((p, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def _rand_scene(n_s, n_w, seed=0):
    rng = np.random.default_rng(seed)
    spheres = Spheres.create(
        center=rng.uniform(-5, 5, (n_s, 3)).astype(np.float32),
        radius=rng.uniform(0.2, 1.5, n_s).astype(np.float32),
        material=Materials.create(rng.uniform(0, 1, (n_s, 3)).astype(np.float32)),
    )
    normals = rng.standard_normal((n_w, 3)).astype(np.float32)
    normals[:, 2] *= 0.2  # keep away from the degenerate z-parallel case
    walls = Walls.create(
        position=rng.uniform(-5, 5, (n_w, 3)).astype(np.float32),
        normal=normals,
        length=rng.uniform(0.5, 4, n_w).astype(np.float32),
        width=rng.uniform(0.5, 4, n_w).astype(np.float32),
        material=Materials.create(rng.uniform(0, 1, (n_w, 3)).astype(np.float32)),
    )
    return Scene.create(spheres=spheres, walls=walls)


def test_sphere_ts_vs_oracle():
    scene = _rand_scene(13, 0, seed=1)
    o, d = _rand_rays(257)
    got = np.asarray(intersect.sphere_hit_ts(scene.spheres, jnp.asarray(o), jnp.asarray(d)))
    s = numpy_ref.scene_to_numpy(scene, np.float32)
    want = numpy_ref._sphere_ts(s, o, d)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_wall_ts_vs_oracle():
    scene = _rand_scene(0, 9, seed=2)
    o, d = _rand_rays(257)
    got = np.asarray(intersect.wall_hit_ts(scene.walls, jnp.asarray(o), jnp.asarray(d)))
    s = numpy_ref.scene_to_numpy(scene, np.float32)
    want = numpy_ref._wall_ts(s, o, d)
    # Edge pixels where f32 rounding flips the bounds test may disagree;
    # demand exact agreement on >99.5% of rays and closeness elsewhere.
    agree = np.isclose(got, want, rtol=1e-4, atol=1e-4)
    assert agree.mean() > 0.995


def test_closest_hit_chunked_matches_unchunked():
    scene = _rand_scene(70, 11, seed=3)
    o, d = _rand_rays(513)
    a = intersect.closest_hit(scene, jnp.asarray(o), jnp.asarray(d), prim_chunk=8)
    b = intersect.closest_hit(scene, jnp.asarray(o), jnp.asarray(d), prim_chunk=4096)
    np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(a.prim_index), np.asarray(b.prim_index))
    np.testing.assert_allclose(np.asarray(a.normal), np.asarray(b.normal), atol=1e-5)


def test_closest_hit_demo_scene_semantics():
    """Camera-origin rays toward the demo sphere must hit it at t ~ 1.0."""
    scene = scenes.reference_demo_scene()
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[1.0, 0.0, 0.0]])  # toward sphere at (1.5,0,0), r=0.5
    rec = intersect.closest_hit(scene, o, d)
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(rec.normal[0]), [-1.0, 0.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(np.asarray(rec.material.color[0]), [0.0, 1.0, 0.0])
    assert int(rec.prim_index[0]) == 0


def test_closest_hit_miss_is_clean():
    scene = scenes.reference_demo_scene()
    o = jnp.zeros((1, 3))
    d = jnp.asarray([[-1.0, 0.0, 0.0]])  # away from everything
    rec = intersect.closest_hit(scene, o, d)
    assert not bool(rec.hit[0])
    assert int(rec.prim_index[0]) == -1
    assert np.all(np.isfinite(np.asarray(rec.point)))
    assert np.all(np.isfinite(np.asarray(rec.normal)))


def test_back_face_wall_normal_unflipped():
    """Replicated quirk: back-face wall hits keep the stored normal
    (scene.cpp:30)."""
    walls = Walls.create(
        position=[[2.0, 1.0, -1.0]],
        normal=[[0.0, -1.0, 0.0]],
        length=[2.0],
        width=[2.0],
        material=Materials.create([[1.0, 1.0, 1.0]]),
    )
    scene = Scene.create(walls=walls)
    # Ray traveling along +y hits the wall's back face (normal points -y).
    o = jnp.asarray([[1.0, 0.0, 0.0]])
    d = jnp.asarray([[0.0, 1.0, 0.0]])
    rec = intersect.closest_hit(scene, o, d)
    assert bool(rec.hit[0])
    np.testing.assert_allclose(np.asarray(rec.normal[0]), [0.0, -1.0, 0.0], atol=1e-6)
