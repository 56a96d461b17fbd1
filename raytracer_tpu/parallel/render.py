"""Mesh-sharded rendering via ``shard_map``.

The TPU replacement for the reference's OpenMP scanline parallelism
(reference: README.md:13,17): pixel rows shard over the ``'px'`` mesh axis
(each device generates and traces only its own rows — no ray ever crosses a
device), and the sphere axis optionally shards over ``'prim'`` with per-shard
closest hits combined by an ``all_gather`` + argmin collective each bounce.
Scene parameters are replicated, so ``jax.grad`` through this function
all-reduces parameter gradients across the mesh automatically (the transpose
of the replicated in-spec is a ``psum`` — the gradient all-reduce named in
BASELINE.json).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from raytracer_tpu.core.types import Camera, Scene
from raytracer_tpu.ops.intersect import HitRecord, closest_hit
from raytracer_tpu.ops.raygen import camera_frame, generate_rays
from raytracer_tpu.ops.tonemap import reinhard_tonemap
from raytracer_tpu.parallel.mesh import (
    PRIM_AXIS,
    PX_AXIS,
    pad_scene_spheres,
    scene_pspecs,
)
from raytracer_tpu.render.integrator import trace_rays

__all__ = ["render_sharded", "render_sharded_impl"]


def _globalize_prim_index(
    rec: HitRecord, n_s_local: int, n_s_global: int, axis: str
) -> HitRecord:
    """Rewrite shard-local primitive indices as global scene indices.

    Local layout per shard: spheres ``[0, n_s_local)`` then walls; global
    layout: spheres ``[0, n_s_global)`` then walls (matching the unsharded
    ``closest_hit`` numbering).
    """
    shard = jax.lax.axis_index(axis)
    is_sphere = (rec.prim_index >= 0) & (rec.prim_index < n_s_local)
    gidx = jnp.where(
        is_sphere,
        rec.prim_index + shard * n_s_local,
        jnp.where(
            rec.prim_index >= 0,
            rec.prim_index - n_s_local + n_s_global,
            -1,
        ),
    )
    return rec.replace(prim_index=gidx)


def _combine_hits(rec: HitRecord, axis: str) -> HitRecord:
    """Reduce per-shard closest hits to the global closest hit.

    ``all_gather`` the [n_shards, ...] candidates over the primitive axis and
    pick the min-t winner per ray. Ties (replicated walls produce identical
    candidates on every shard) resolve to the lowest shard, which holds the
    same record — idempotent by construction.
    """
    gathered = jax.tree_util.tree_map(
        lambda x: jax.lax.all_gather(x, axis), rec
    )
    win = jnp.argmin(gathered.t, axis=0)  # [P]

    def pick(x):
        w = win.reshape((1,) + win.shape + (1,) * (x.ndim - 1 - win.ndim))
        return jnp.take_along_axis(x, jnp.broadcast_to(w, (1,) + x.shape[1:]), 0)[0]

    return jax.tree_util.tree_map(pick, gathered)


def render_sharded_impl(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    *,
    mesh: jax.sharding.Mesh,
    depth: int = 3,
    tonemap: bool = True,
    prim_chunk: int = 128,
) -> jnp.ndarray:
    """Un-jitted sharded render, for composition into jitted loss functions."""
    n_px = mesh.shape[PX_AXIS]
    n_prim = mesh.shape[PRIM_AXIS]

    scene = pad_scene_spheres(scene, n_prim)
    n_s_global = len(scene.spheres)
    n_s_local = n_s_global // n_prim

    rows = -(-height // n_px)  # rows per px-shard, padded up
    h_pad = rows * n_px

    def local_render(scene_local: Scene, camera: Camera) -> jnp.ndarray:
        row0 = jax.lax.axis_index(PX_AXIS) * rows
        # Frame anchors use the TRUE height so sharding never changes the
        # frustum; pad rows sample past the bottom edge and are cropped off.
        frame = camera_frame(camera, width, height)
        o, d = generate_rays(frame, width, rows, row_offset=row0)
        # Rays interact with prim-sharded scene data each bounce, so mark
        # them varying over the full mesh up front (keeps the bounce-scan
        # carry type stable under shard_map's varying-axes checking).
        # Origins are a broadcast of the replicated camera position, so they
        # start unvarying; directions already vary over px via axis_index.
        o = jax.lax.pcast(o, (PX_AXIS, PRIM_AXIS), to="varying")
        d = jax.lax.pcast(d, (PRIM_AXIS,), to="varying")

        if n_prim > 1:

            def hit_fn(sc, oo, dd):
                rec = closest_hit(sc, oo, dd, prim_chunk=prim_chunk)
                rec = _globalize_prim_index(rec, n_s_local, n_s_global, PRIM_AXIS)
                return _combine_hits(rec, PRIM_AXIS)

        else:

            def hit_fn(sc, oo, dd):
                return closest_hit(sc, oo, dd, prim_chunk=prim_chunk)

        radiance = trace_rays(
            scene_local,
            o.reshape(-1, 3),
            d.reshape(-1, 3),
            depth=depth,
            closest_hit_fn=hit_fn,
        )
        img = radiance.reshape(rows, width, 3)
        if tonemap:
            img = reinhard_tonemap(img)
        # Every prim-shard holds the identical tile; the mean-psum both
        # certifies replication over 'prim' and keeps gradients exact.
        return jax.lax.psum(img, PRIM_AXIS) / n_prim

    sharded = jax.shard_map(
        local_render,
        mesh=mesh,
        in_specs=(scene_pspecs(), P()),
        out_specs=P(PX_AXIS, None, None),
    )
    img = sharded(scene, camera)
    return img[:height] if h_pad != height else img


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "mesh", "depth", "tonemap", "prim_chunk"),
)
def render_sharded(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    *,
    mesh: jax.sharding.Mesh,
    depth: int = 3,
    tonemap: bool = True,
    prim_chunk: int = 128,
) -> jnp.ndarray:
    """Jitted mesh-sharded render to an ``[H, W, 3]`` image.

    Bit-identical to the single-device ``render`` (same frustum, same
    integrator) — asserted by tests/test_parallel.py — just laid out across
    the mesh.
    """
    return render_sharded_impl(
        scene,
        camera,
        width,
        height,
        mesh=mesh,
        depth=depth,
        tonemap=tonemap,
        prim_chunk=prim_chunk,
    )
