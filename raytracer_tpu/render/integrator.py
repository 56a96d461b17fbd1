"""The public render pipeline over the fused SoA hot path.

Rebuild of ``rt_scene`` + ``recursive_ray_tracing`` (main.cpp:89-139): ray
generation, the bounce loop, and Reinhard tone mapping as one jit-compiled
program. The compute lives in ops/trace.py in component-SoA image layout;
this module handles the API boundary (``[H, W, 3]`` images, ``[P, 3]`` ray
batches), row-chunking for very large frames, and the depth-only pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from raytracer_tpu.core.types import Camera, Scene
from raytracer_tpu.core.v3 import V3
from raytracer_tpu.ops.tonemap import reinhard_tonemap
from raytracer_tpu.ops.trace import closest_hit_soa, render_tile, trace_soa

__all__ = ["trace_rays", "render", "render_depth"]

# Target pixels per row-chunk: bounds the live [rows, W] buffer set so 4K+
# frames don't balloon peak HBM while each chunk stays VPU-saturating.
_CHUNK_PIXELS = 1 << 21


def _row_chunks(width: int, height: int, row_chunk: int) -> int:
    """Rows per chunk (the whole image when it is small enough)."""
    if row_chunk:
        return row_chunk
    if width * height <= _CHUNK_PIXELS:
        return height
    return max(1, _CHUNK_PIXELS // width)


def trace_rays(
    scene: Scene,
    origins: jnp.ndarray,  # f32[P, 3]
    directions: jnp.ndarray,  # f32[P, 3] unit
    *,
    depth: int = 3,
    prim_chunk: int = 64,
) -> jnp.ndarray:
    """Radiance transported along each ray, ``[P, 3]`` (pre-tonemap).

    Batch-of-rays API: internally reshaped to the 2-D lane layout the TPU
    fold wants (see core/v3.py), padded to a multiple of 128.
    """
    p = origins.shape[0]
    lanes = 128
    rows = -(-p // lanes)
    pad = rows * lanes - p

    def to2d(a):
        if pad:
            a = jnp.concatenate([a, jnp.ones((pad, 3), a.dtype)], axis=0)
        return V3.from_stacked(a.reshape(rows, lanes, 3))

    radiance = trace_soa(
        scene, to2d(origins), to2d(directions), depth=depth, prim_unroll=prim_chunk
    )
    out = radiance.stacked().reshape(rows * lanes, 3)
    return out[:p] if pad else out


@functools.partial(
    jax.jit,
    static_argnames=(
        "width", "height", "depth", "tonemap", "prim_chunk", "row_chunk",
        "fold", "supersample",
    ),
)
def render(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    *,
    depth: int = 3,
    tonemap: bool = True,
    prim_chunk: int = 64,
    row_chunk: int = 0,
    fold: str = "auto",
    supersample: int = 1,
) -> jnp.ndarray:
    """Render the scene to an ``[H, W, 3]`` float image in [0, 1).

    The full forward pass (one ``rt_scene`` frame, main.cpp:124-139, plus the
    tone-map stage the reference README promises): raygen -> fused bounce
    loop -> Reinhard, one compiled program. ``row_chunk=0`` auto-picks a
    row tiling that bounds peak memory on large frames.

    ``supersample=k`` renders k*k rays per pixel on a finer grid and box-
    filters — anti-aliasing the reference lacks (one ray per pixel, no
    jitter, SURVEY.md row 14). Radiance is averaged pre-tonemap.
    """
    ss = supersample
    rw, rh = width * ss, height * ss
    rows = _row_chunks(rw, rh, row_chunk * ss if row_chunk else 0)
    rows -= rows % ss or 0  # keep chunk boundaries on whole-pixel rows
    rows = max(rows, ss)
    tiles = []
    for r0 in range(0, rh, rows):
        tile = render_tile(
            scene,
            camera,
            rw,
            rh,
            row_offset=r0,
            rows=min(rows, rh - r0),
            depth=depth,
            prim_unroll=prim_chunk,
            fold=fold,
        )
        tiles.append(tile.stacked())
    img = tiles[0] if len(tiles) == 1 else jnp.concatenate(tiles, axis=0)
    if ss > 1:
        img = img.reshape(height, ss, width, ss, 3).mean(axis=(1, 3))
    return reinhard_tonemap(img) if tonemap else img


@functools.partial(
    jax.jit, static_argnames=("width", "height", "prim_chunk", "row_chunk")
)
def render_depth(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    *,
    prim_chunk: int = 64,
    row_chunk: int = 0,
) -> jnp.ndarray:
    """Depth-only pass: closest-hit distance per pixel, ``[H, W]``.

    Misses are +inf. This is the capability behind the reference's Sprint-1
    1-D depth buffers (README.md:28-37) and BASELINE config 1's
    "depth-only pass".
    """
    from raytracer_tpu.ops.trace import raygen_tile

    rows = _row_chunks(width, height, row_chunk)
    tiles = []
    for r0 in range(0, height, rows):
        o, d = raygen_tile(
            camera, width, height, row_offset=r0, rows=min(rows, height - r0)
        )
        rec = closest_hit_soa(scene, o, d, prim_unroll=prim_chunk)
        tiles.append(jnp.where(rec.hit, rec.t, jnp.inf))
    return tiles[0] if len(tiles) == 1 else jnp.concatenate(tiles, axis=0)
