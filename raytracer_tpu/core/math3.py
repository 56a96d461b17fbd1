"""3-vector math on trailing-axis-3 arrays.

TPU-native rebuild of the reference's scalar ``vec3`` library
(reference: vec.h:12-41, vec.cpp:1-63). Instead of a per-pixel value class,
every quantity is an ``f32[..., 3]`` array and all operations are pure
broadcasting functions, so a whole frame of rays is a single SIMD value that
XLA maps onto the TPU VPU lanes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = [
    "dot",
    "length",
    "length_squared",
    "normalize",
    "cross",
    "lerp",
    "reflect",
]


def dot(a: jnp.ndarray, b: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    """Inner product over the trailing xyz axis (reference: vec.cpp:11-14)."""
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def length_squared(v: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    """Squared Euclidean norm (reference: vec.cpp:7-9)."""
    return jnp.sum(v * v, axis=-1, keepdims=keepdims)


def length(v: jnp.ndarray, keepdims: bool = False) -> jnp.ndarray:
    """Euclidean norm (reference: vec.cpp:3-5)."""
    return jnp.sqrt(length_squared(v, keepdims=keepdims))


def normalize(v: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    """Unit vector along ``v`` (reference: vec.cpp:22-25).

    ``eps > 0`` guards the zero vector (the reference divides by zero there);
    the default keeps exact parity with the reference semantics.
    """
    n2 = length_squared(v, keepdims=True)
    if eps:
        n2 = jnp.maximum(n2, eps)
    # rsqrt is a single fast VPU op; the reference does sqrt then divide.
    return v * jax.lax.rsqrt(n2)


def cross(u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Cross product over the trailing xyz axis (reference: vec.cpp:15-20)."""
    ux, uy, uz = u[..., 0], u[..., 1], u[..., 2]
    vx, vy, vz = v[..., 0], v[..., 1], v[..., 2]
    return jnp.stack(
        [uy * vz - uz * vy, uz * vx - ux * vz, ux * vy - uy * vx], axis=-1
    )


def lerp(a: jnp.ndarray, b: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Linear interpolation ``a + t*(b-a)`` (reference: vec.cpp:45-49).

    ``t`` broadcasts against the trailing axes of ``a``/``b``.
    """
    return a + t * (b - a)


def reflect(v_unit: jnp.ndarray, n_unit: jnp.ndarray) -> jnp.ndarray:
    """Mirror-reflect direction ``v`` about normal ``n``.

    The reference (vec.cpp:51-57) normalizes both inputs internally; in this
    framework directions and normals are kept unit-length throughout the
    bounce loop, so the normalizations are hoisted out of the hot path and
    callers MUST pass unit vectors. The result is then unit-length too.
    """
    return v_unit - n_unit * (2.0 * dot(v_unit, n_unit, keepdims=True))
