"""The trace-path closest-hit fold vs the NumPy oracle + semantics checks.

Ports the legacy ``ops/intersect.py`` test coverage (oracle parity, chunked
fold equivalence, demo-scene semantics, miss cleanliness, the back-face
wall-normal quirk of scene.cpp:30) onto the real pipeline kernels in
``ops/trace.py`` — ``fold_closest_jnp`` and ``closest_hit_soa``.
"""

import numpy as np
import jax.numpy as jnp

from raytracer_tpu.core.types import Materials, Scene, Spheres, Walls
from raytracer_tpu.core.v3 import V3
from raytracer_tpu.models import scenes
from raytracer_tpu.ops.trace import MISS_T, closest_hit_soa, fold_closest_jnp
from raytracer_tpu.oracle import numpy_ref


def _rand_rays(p, seed=7):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-2, 2, (p, 3)).astype(np.float32)
    d = rng.standard_normal((p, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return o, d


def _v3(arr):
    a = jnp.asarray(arr)
    return V3(a[:, 0], a[:, 1], a[:, 2])


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


def test_fold_sphere_min_t_vs_oracle():
    scene = _rand_scene(13, 0, seed=1)
    o, d = _rand_rays(257)
    bt, bi = fold_closest_jnp(scene, _v3(o), _v3(d))
    s = numpy_ref.scene_to_numpy(scene, np.float32)
    ts = numpy_ref._sphere_ts(s, o, d)  # [P, N]
    want_t = ts.min(axis=1)
    np.testing.assert_allclose(np.asarray(bt), want_t, rtol=1e-4, atol=1e-4)
    hit = want_t < MISS_T
    np.testing.assert_array_equal(np.asarray(bi)[hit], ts.argmin(axis=1)[hit])
    assert (np.asarray(bi)[~hit] == -1).all()


def test_fold_wall_min_t_vs_oracle():
    scene = _rand_scene(0, 9, seed=2)
    o, d = _rand_rays(257)
    bt, _ = fold_closest_jnp(scene, _v3(o), _v3(d))
    s = numpy_ref.scene_to_numpy(scene, np.float32)
    want_t = numpy_ref._wall_ts(s, o, d).min(axis=1)
    # Edge pixels where f32 rounding flips the bounds test may disagree;
    # demand exact agreement on >99.5% of rays.
    agree = np.isclose(np.asarray(bt), want_t, rtol=1e-4, atol=1e-4)
    assert agree.mean() > 0.995


def test_fold_chunked_matches_unchunked():
    scene = _rand_scene(70, 11, seed=3)
    o, d = _rand_rays(513)
    ov, dv = _v3(o), _v3(d)
    bt_a, bi_a = fold_closest_jnp(scene, ov, dv, prim_unroll=8)
    bt_b, bi_b = fold_closest_jnp(scene, ov, dv, prim_unroll=4096)
    np.testing.assert_allclose(np.asarray(bt_a), np.asarray(bt_b), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(bi_a), np.asarray(bi_b))


def test_closest_hit_demo_scene_semantics():
    """Camera-origin rays toward the demo sphere must hit it at t ~ 1.0."""
    scene = scenes.reference_demo_scene()
    o = _v3(np.zeros((1, 3), np.float32))
    d = _v3(np.asarray([[1.0, 0.0, 0.0]], np.float32))
    rec = closest_hit_soa(scene, o, d)  # toward sphere at (1.5,0,0), r=0.5
    assert bool(rec.hit[0])
    np.testing.assert_allclose(float(rec.t[0]), 1.0, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(rec.normal.stacked()[0]), [-1.0, 0.0, 0.0], atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(rec.color.stacked()[0]), [0.0, 1.0, 0.0])
    assert int(rec.prim_index[0]) == 0


def test_closest_hit_miss_is_clean():
    scene = scenes.reference_demo_scene()
    o = _v3(np.zeros((1, 3), np.float32))
    d = _v3(np.asarray([[-1.0, 0.0, 0.0]], np.float32))  # away from everything
    rec = closest_hit_soa(scene, o, d)
    assert not bool(rec.hit[0])
    assert int(rec.prim_index[0]) == -1
    assert np.all(np.isfinite(np.asarray(rec.point.stacked())))
    assert np.all(np.isfinite(np.asarray(rec.normal.stacked())))


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
    o = _v3(np.asarray([[1.0, 0.0, 0.0]], np.float32))
    d = _v3(np.asarray([[0.0, 1.0, 0.0]], np.float32))
    rec = closest_hit_soa(scene, o, d)
    assert bool(rec.hit[0])
    np.testing.assert_allclose(
        np.asarray(rec.normal.stacked()[0]), [0.0, -1.0, 0.0], atol=1e-6
    )


def test_safe_inv_tiny_negative_component():
    """A direction component in (-1e-12, 0) must not collapse the slab axis
    to (0, 0) — the sign-preserving fill regression (ADVICE r1)."""
    from raytracer_tpu.core.types import Boxes

    boxes = Boxes.create(
        minimum=[[1.0, -1.0, -1.0]],
        maximum=[[2.0, 1.0, 1.0]],
        material=Materials.create([[1.0, 0.0, 0.0]]),
    )
    scene = Scene.create(boxes=boxes)
    o = _v3(np.asarray([[0.0, 0.0, 0.0]], np.float32))
    # x-dominant ray with a tiny NEGATIVE y component: must still hit the box.
    d = _v3(np.asarray([[1.0, -1e-13, 0.0]], np.float32))
    bt, bi = fold_closest_jnp(scene, o, d)
    assert float(bt[0]) < MISS_T
    np.testing.assert_allclose(float(bt[0]), 1.0, atol=1e-5)
