"""Blinn-Phong local shading and the sky/ground background.

Rebuild of the reference's free shading functions: ``out_color``
(main.cpp:28-37), ``diffuse_shading`` (main.cpp:42-48), ``specular``
(main.cpp:53-62), and the local-color combination inside
``recursive_ray_tracing`` (main.cpp:102-104) — vectorized over all rays
(pure VPU code) and extended with the sun directional light the README
claims as a Sprint-3 feature (main.cpp:18-19 #defines it but never uses it;
a zero sun color reproduces the snapshot exactly).

Lighting model per hit point (matching main.cpp:102-104 for one white point
light): ``color * (sum_lights light_color * (diffuse*kd + spec^e * ks)
+ ambient)`` with Lambertian diffuse and Blinn-Phong half-vector specular.
No shadow rays — the reference casts none.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracer_tpu.core import math3
from raytracer_tpu.core.types import Lights, Materials, Sky

__all__ = ["background_color", "shade_local"]


def background_color(d: jnp.ndarray, sky: Sky) -> jnp.ndarray:
    """Sky gradient / flat ground for unit ray directions ``[P, 3]``.

    Mirrors ``out_color`` (main.cpp:28-37): below-horizon rays (z < 0) get the
    ground color, others lerp horizon->zenith by ``z ** gradient_exponent``.
    """
    z = d[..., 2]
    # Double-where keeps pow's derivative finite at z == 0 on ground lanes.
    z_pos = jnp.where(z > 0.0, z, 1.0)
    grad = jnp.where(z > 0.0, z_pos**sky.gradient_exponent, 0.0)[..., None]
    sky_col = math3.lerp(sky.horizon_color, sky.zenith_color, grad)
    return jnp.where((z < 0.0)[..., None], sky.ground_color, sky_col)


def _light_terms(
    light_dir: jnp.ndarray,  # [P, 3] unit, surface -> light
    normal: jnp.ndarray,  # [P, 3] unit
    view_dir: jnp.ndarray,  # [P, 3] unit, surface -> eye
    exponent: jnp.ndarray,  # [P]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(diffuse, specular^exponent) intensities for one light direction."""
    diffuse = jnp.maximum(math3.dot(light_dir, normal), 0.0)
    half = math3.normalize(view_dir + light_dir)
    spec_base = jnp.maximum(math3.dot(half, normal), 0.0)
    # Double-where: 0 ** e has an infinite derivative w.r.t. e's base at 0.
    base_safe = jnp.where(spec_base > 0.0, spec_base, 1.0)
    specular = jnp.where(spec_base > 0.0, base_safe**exponent, 0.0)
    return diffuse, specular


def shade_local(
    point: jnp.ndarray,  # [P, 3] hit positions
    normal: jnp.ndarray,  # [P, 3] unit normals
    view_dir: jnp.ndarray,  # [P, 3] unit, surface -> eye (= -ray direction)
    material: Materials,  # per-ray gathered material
    lights: Lights,
) -> jnp.ndarray:
    """Local Blinn-Phong color ``[P, 3]`` at each hit point.

    Point-light loop replicates diffuse_shading/specular + the combination at
    main.cpp:102-104; the sun adds the same terms with a constant direction.
    The (small, static) number of lights is a Python loop — unrolled into
    straight-line fused VPU code by XLA.
    """
    kd = material.diffuse[:, None]
    ks = material.specular[:, None]
    exp = material.specular_exponent

    intensity = jnp.zeros_like(point)
    num_lights = lights.point_position.shape[0]
    for li in range(num_lights):
        ldir = math3.normalize(lights.point_position[li] - point)
        diff, spec = _light_terms(ldir, normal, view_dir, exp)
        intensity = intensity + lights.point_color[li] * (
            diff[:, None] * kd + spec[:, None] * ks
        )

    # Suns: constant directions; a [0, 3] sun array disables statically.
    for si in range(lights.sun_color.shape[0]):
        sun_dir = math3.normalize(lights.sun_direction[si])
        sdiff, sspec = _light_terms(
            jnp.broadcast_to(sun_dir, point.shape), normal, view_dir, exp
        )
        intensity = intensity + lights.sun_color[si] * (
            sdiff[:, None] * kd + sspec[:, None] * ks
        )

    return material.color * (intensity + material.ambient[:, None])
