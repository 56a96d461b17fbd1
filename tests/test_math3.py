"""Unit tests for core.math3 against plain NumPy (oracle for vec.cpp:1-63)."""

import numpy as np
import jax.numpy as jnp

from raytracer_tpu.core import math3

RNG = np.random.default_rng(42)


def _rand(*shape):
    return RNG.standard_normal(shape).astype(np.float32)


def test_dot_cross_length():
    a, b = _rand(17, 3), _rand(17, 3)
    np.testing.assert_allclose(math3.dot(a, b), np.sum(a * b, -1), rtol=1e-6)
    np.testing.assert_allclose(math3.cross(a, b), np.cross(a, b), rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(
        math3.length(a), np.linalg.norm(a, axis=-1), rtol=1e-6
    )
    np.testing.assert_allclose(
        math3.length_squared(a), np.sum(a * a, -1), rtol=1e-6
    )


def test_normalize_unit():
    v = _rand(32, 3) * 10.0
    n = np.asarray(math3.normalize(v))
    np.testing.assert_allclose(np.linalg.norm(n, axis=-1), 1.0, atol=1e-5)
    np.testing.assert_allclose(n, v / np.linalg.norm(v, axis=-1, keepdims=True), atol=1e-5)


def test_lerp_endpoints():
    a, b = _rand(5, 3), _rand(5, 3)
    np.testing.assert_allclose(math3.lerp(a, b, 0.0), a, atol=1e-7)
    np.testing.assert_allclose(math3.lerp(a, b, 1.0), b, atol=1e-6)
    np.testing.assert_allclose(math3.lerp(a, b, 0.25), a + 0.25 * (b - a), atol=1e-6)


def test_reflect_matches_reference_semantics():
    """vec3::reflect (vec.cpp:51-57) on unit inputs: v - 2(v.n)n, unit out."""
    v = np.asarray(math3.normalize(_rand(64, 3)))
    n = np.asarray(math3.normalize(_rand(64, 3)))
    r = np.asarray(math3.reflect(jnp.asarray(v), jnp.asarray(n)))
    expected = v - 2.0 * np.sum(v * n, -1, keepdims=True) * n
    np.testing.assert_allclose(r, expected, atol=1e-6)
    # Mirror reflection preserves length.
    np.testing.assert_allclose(np.linalg.norm(r, axis=-1), 1.0, atol=1e-5)
    # Angle of incidence == angle of reflection about the normal.
    np.testing.assert_allclose(
        np.sum(r * n, -1), -np.sum(v * n, -1), atol=1e-5
    )
