"""raytracer_tpu — a TPU-native differentiable ray tracing framework.

A from-scratch rebuild of the capabilities of the reference CPU ray tracer
(AhmedHesham307/Ray-Tracer-from-scratch): camera ray generation, ray-sphere
and ray-wall intersection, Blinn-Phong shading with point + sun lights and a
sky-gradient background, fixed-depth recursive mirror reflections, Reinhard
tone mapping, camera movement, and per-phase performance profiling — designed
TPU-first:

* structure-of-arrays scene pytrees instead of virtual-dispatch objects,
* one batched SIMD trace over all pixels instead of a per-pixel loop,
* the reference's recursion unrolled as a bounded ``lax.scan``,
* a Pallas megakernel for the hot intersection/shading loop,
* pixel-grid sharding over a ``jax.sharding.Mesh`` with gradient ``psum``
  instead of OpenMP scanline threads,
* everything differentiable w.r.t. scene geometry, materials, and lights.
"""

from raytracer_tpu.core.types import (
    Camera,
    Lights,
    Materials,
    Scene,
    Sky,
    Spheres,
    Walls,
)
from raytracer_tpu.diff import render_soft
from raytracer_tpu.parallel import make_mesh, render_sharded
from raytracer_tpu.render.integrator import render, render_depth, trace_rays

__version__ = "0.1.0"

__all__ = [
    "Camera",
    "Lights",
    "Materials",
    "Scene",
    "Sky",
    "Spheres",
    "Walls",
    "render",
    "render_depth",
    "render_soft",
    "render_sharded",
    "make_mesh",
    "trace_rays",
]
