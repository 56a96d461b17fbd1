"""Component-structure-of-arrays 3-vectors for the TPU hot path.

The reference's ``vec3`` (vec.h:12-41) is one struct per value; the first
TPU rebuild kept xyz on a trailing axis (``f32[..., 3]``), but a trailing
axis of 3 maps onto the VPU's (8 sublanes x 128 lanes) tiles with 3/128 lane
utilization — measured ~6x slower than keeping each component a full
``[H, W]`` array where the image width rides the lane axis. ``V3`` is that
layout: a pytree of three same-shaped arrays, one per component.

All ops are pure and broadcast; everything fuses into neighboring kernels.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["V3"]


class V3(NamedTuple):
    """A 3-vector whose components are separate (same-shaped) arrays."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # -- construction / conversion ------------------------------------------
    @staticmethod
    def from_stacked(a: jnp.ndarray) -> "V3":
        """From an ``[..., 3]`` array (the API-boundary layout)."""
        return V3(a[..., 0], a[..., 1], a[..., 2])

    @staticmethod
    def fill(shape, value, dtype=jnp.float32) -> "V3":
        v = jnp.full(shape, value, dtype)
        return V3(v, v, v)

    def stacked(self) -> jnp.ndarray:
        """To an ``[..., 3]`` array (only at the API boundary — one transpose)."""
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    # -- arithmetic ----------------------------------------------------------
    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __mul__(self, s):
        """Scalar/array broadcast multiply, or elementwise (Hadamard) by V3."""
        if isinstance(s, V3):
            return V3(self.x * s.x, self.y * s.y, self.z * s.z)
        return V3(self.x * s, self.y * s, self.z * s)

    __rmul__ = __mul__

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)

    # -- geometry (reference: vec.cpp:3-57) ---------------------------------
    def dot(self, o: "V3") -> jnp.ndarray:
        return self.x * o.x + self.y * o.y + self.z * o.z

    def norm2(self) -> jnp.ndarray:
        return self.dot(self)

    def norm(self) -> jnp.ndarray:
        return jnp.sqrt(self.norm2())

    def normalized(self, eps: float = 0.0) -> "V3":
        """Unit vector; ``eps > 0`` guards the zero vector (rsqrt(0) = inf)."""
        n2 = self.norm2()
        if eps:
            n2 = jnp.maximum(n2, eps)
        return self * jax.lax.rsqrt(n2)

    def cross(self, o: "V3") -> "V3":
        return V3(
            self.y * o.z - self.z * o.y,
            self.z * o.x - self.x * o.z,
            self.x * o.y - self.y * o.x,
        )

    def reflect(self, n_unit: "V3") -> "V3":
        """Mirror about a unit normal (reference: vec.cpp:51-57; inputs unit)."""
        return self - n_unit * (2.0 * self.dot(n_unit))

    @staticmethod
    def where(pred: jnp.ndarray, a: "V3", b: "V3") -> "V3":
        return V3(
            jnp.where(pred, a.x, b.x),
            jnp.where(pred, a.y, b.y),
            jnp.where(pred, a.z, b.z),
        )

    @staticmethod
    def lerp(a: "V3", b: "V3", t) -> "V3":
        """a + t*(b - a) (reference: vec.cpp:45-49)."""
        return a + (b - a) * t

    def take(self, idx: jnp.ndarray) -> "V3":
        """Gather per-component from length-N tables by an index array."""
        return V3(
            jnp.take(self.x, idx, mode="clip"),
            jnp.take(self.y, idx, mode="clip"),
            jnp.take(self.z, idx, mode="clip"),
        )
