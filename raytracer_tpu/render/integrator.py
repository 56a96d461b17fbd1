"""The bounce-loop integrator and the full render pipeline.

Rebuild of ``recursive_ray_tracing`` (main.cpp:89-119) and ``rt_scene``
(main.cpp:124-139). The reference recurses per pixel up to 10 reflections
deep; recursion is hostile to XLA (dynamic call depth, scalar state), so the
key transformation is unrolling it *forward* as a bounded ``lax.scan`` with a
per-ray carry ``(origin, direction, throughput w, accumulated color)``:

    reference:  C_k = lerp(local_k, C_{k+1}, m_k)        (main.cpp:117)
    scan:       accum += w * (1 - m_k) * local_k;  w *= m_k        (hit)
                accum += w * local_k;              w  = 0          (hit, last)
                accum += w * sky(d);               w  = 0          (miss)

which is the same algebra expanded front-to-back. Dead lanes (missed rays)
keep static shapes and carry w = 0, so their later contributions are exact
zeros and gradients stay clean.

``depth`` counts reflection *bounces*: ``depth = N`` performs ``N + 1``
shading evaluations, matching the reference's ``remaining_iterations = N``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from raytracer_tpu.core import math3
from raytracer_tpu.core.types import Camera, Scene
from raytracer_tpu.ops.intersect import MISS_T, closest_hit
from raytracer_tpu.ops.raygen import camera_frame, generate_rays
from raytracer_tpu.ops.shading import background_color, shade_local
from raytracer_tpu.ops.tonemap import reinhard_tonemap

__all__ = ["trace_rays", "render", "render_depth"]

# Offset of secondary-ray origins along the normal, preventing self-hits
# (reference: main.cpp:111).
_REFLECT_EPS = 1e-4


def trace_rays(
    scene: Scene,
    origins: jnp.ndarray,  # f32[P, 3]
    directions: jnp.ndarray,  # f32[P, 3] unit
    *,
    depth: int = 3,
    prim_chunk: int = 128,
    closest_hit_fn=None,
) -> jnp.ndarray:
    """Radiance transported along each ray, ``[P, 3]`` (pre-tonemap).

    ``closest_hit_fn(scene, o, d) -> HitRecord`` overrides the hit kernel —
    the sharded renderer (parallel/) injects a primitive-sharded version that
    combines per-shard winners with a mesh collective; the Pallas path
    injects its megakernel.
    """
    if closest_hit_fn is None:
        closest_hit_fn = functools.partial(closest_hit, prim_chunk=prim_chunk)

    def level(carry, k):
        o, d, w, accum = carry
        rec = closest_hit_fn(scene, o, d)
        local = shade_local(rec.point, rec.normal, -d, rec.material, scene.lights)
        sky = background_color(d, scene.sky)

        is_last = k == depth
        m = rec.material.metallic[:, None]
        hit = rec.hit[:, None]
        # Hit: local color weighted by (1 - metallic), except the final level
        # which returns the full local color (main.cpp:105-108). Miss: sky.
        contrib = jnp.where(hit, jnp.where(is_last, local, (1.0 - m) * local), sky)
        accum = accum + w * contrib
        w = w * jnp.where(hit & jnp.logical_not(is_last), m, 0.0)

        # Reflection ray, offset off the surface (main.cpp:111-113). Dead
        # lanes keep their previous ray so the state stays finite and unit.
        new_o = jnp.where(hit, rec.point + rec.normal * _REFLECT_EPS, o)
        new_d = jnp.where(hit, math3.reflect(d, rec.normal), d)
        return (new_o, new_d, w, accum), None

    # Derive w/accum arithmetically from the inputs (not via fresh zeros/ones)
    # so that, under shard_map, they inherit the rays' varying-axes type and
    # the scan carry type-checks.
    carry = (
        origins,
        directions,
        origins[:, :1] * 0.0 + 1.0,
        origins * 0.0,
    )
    (_, _, _, accum), _ = jax.lax.scan(
        level, carry, jnp.arange(depth + 1, dtype=jnp.int32)
    )
    return accum


def _chunked_over_rays(fn, o: jnp.ndarray, d: jnp.ndarray, ray_chunk: int):
    """Apply ``fn([C,3],[C,3]) -> [C,k]`` over ray chunks via ``lax.map``.

    Sequential over chunks: bounds peak memory to one chunk's intermediates
    while each chunk is still large enough to saturate the VPU. This is the
    memory-tiling role the OpenMP scanline split played on CPU (README.md:13)
    — the *parallelism* role moves to the device mesh (parallel/).
    """
    p = o.shape[0]
    if p <= ray_chunk:
        return fn(o, d)
    k = -(-p // ray_chunk)
    pad = k * ray_chunk - p
    if pad:
        o = jnp.concatenate([o, jnp.zeros((pad, 3), o.dtype)], axis=0)
        d = jnp.concatenate(
            [d, jnp.tile(jnp.array([[0.0, 0.0, 1.0]], d.dtype), (pad, 1))], axis=0
        )
    o = o.reshape(k, ray_chunk, 3)
    d = d.reshape(k, ray_chunk, 3)
    out = jax.lax.map(lambda od: fn(od[0], od[1]), (o, d))
    out = out.reshape(k * ray_chunk, *out.shape[2:])
    return out[:p] if pad else out


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "depth", "tonemap", "prim_chunk", "ray_chunk"),
)
def render(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    *,
    depth: int = 3,
    tonemap: bool = True,
    prim_chunk: int = 128,
    ray_chunk: int = 1 << 19,
) -> jnp.ndarray:
    """Render the scene to an ``[H, W, 3]`` float image in [0, 1).

    The full forward pass (rebuild of one ``rt_scene`` frame, main.cpp:124-139
    plus the missing tone-map stage): ray generation -> bounce scan ->
    Reinhard tone map, one jit-compiled program.
    """
    frame = camera_frame(camera, width, height)
    o, d = generate_rays(frame, width, height)
    radiance = _chunked_over_rays(
        lambda oo, dd: trace_rays(scene, oo, dd, depth=depth, prim_chunk=prim_chunk),
        o.reshape(-1, 3),
        d.reshape(-1, 3),
        ray_chunk,
    )
    img = radiance.reshape(height, width, 3)
    return reinhard_tonemap(img) if tonemap else img


@functools.partial(
    jax.jit, static_argnames=("width", "height", "prim_chunk", "ray_chunk")
)
def render_depth(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    *,
    prim_chunk: int = 128,
    ray_chunk: int = 1 << 19,
) -> jnp.ndarray:
    """Depth-only pass: closest-hit distance per pixel, ``[H, W]``.

    Misses are +inf. This is the capability behind the reference's Sprint-1
    1-D depth buffers (README.md:28-37) and BASELINE config 1's
    "depth-only pass".
    """
    frame = camera_frame(camera, width, height)
    o, d = generate_rays(frame, width, height)

    def depth_fn(oo, dd):
        rec = closest_hit(scene, oo, dd, prim_chunk=prim_chunk)
        return jnp.where(rec.hit, rec.t, jnp.inf)[:, None]

    t = _chunked_over_rays(depth_fn, o.reshape(-1, 3), d.reshape(-1, 3), ray_chunk)
    return t.reshape(height, width)
