"""Batched ray-primitive intersection and closest-hit resolution.

Rebuild of the reference's per-ray virtual-dispatch intersection
(``SceneGeometry::intersect``, scene.h:57; ``Sphere::intersect``,
scene.cpp:40-78; ``Wall::intersect``, scene.cpp:4-35) and the linear
closest-hit scan (``find_closest_hit``, main.cpp:67-84).

TPU-first design: intersections are computed for a whole ``[P]`` batch of
rays against primitive *chunks* held in registers/VMEM, with a running
(min-t, argmin-index) carry folded by ``lax.scan`` — the same algorithm the
Pallas megakernel uses, expressed in pure jnp so XLA can fuse it. Memory
never materializes more than ``[P, chunk]`` at once, so a 4K frame against
1024 spheres stays inside VMEM-sized tiles.

Distance metric: ray directions are unit length throughout the framework, so
parametric t *is* Euclidean distance — this erases the reference's mixed
metric (Euclidean for spheres, scene.cpp:77; parametric for walls,
scene.cpp:30) in a way that changes nothing for the reference scenes once
primary directions are normalized (quirk policy, SURVEY.md §7).

Misses are encoded as ``t = MISS_T`` (a large finite value, not inf, so that
miss lanes never breed NaNs whose reverse-mode 0*NaN would poison gradients).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp

from raytracer_tpu.core import math3
from raytracer_tpu.core.types import (
    Materials,
    Scene,
    Spheres,
    Walls,
    pytree_dataclass,
)

__all__ = ["MISS_T", "HitRecord", "sphere_hit_ts", "wall_hit_ts", "closest_hit"]

# Large finite sentinel for "no hit". Anything real is many orders of
# magnitude closer; arithmetic on it stays finite in f32.
MISS_T = 1e30

# Matches find_closest_hit's strict `distance > 0` acceptance (main.cpp:77).
_T_MIN = 0.0


def sphere_hit_ts(spheres: Spheres, o: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Ray-sphere hit distances, ``[P, N]`` (miss = MISS_T).

    Quadratic test as in scene.cpp:40-78 with ``a = |d|^2 = 1`` folded out
    (unit directions): ``t = (-b - sqrt(b^2 - 4c)) / 2`` — the nearer root;
    like the reference, a ray starting inside the sphere reports its nearer
    (negative) root and is rejected by the ``t > 0`` acceptance test.
    """
    oc = o[:, None, :] - spheres.center[None, :, :]  # [P, N, 3]
    b = 2.0 * jnp.sum(d[:, None, :] * oc, axis=-1)  # [P, N]
    c = jnp.sum(oc * oc, axis=-1) - spheres.radius[None, :] ** 2
    det = b * b - 4.0 * c
    front = det >= 0.0
    # Double-where: keep sqrt's input positive on miss lanes so its derivative
    # stays finite (0 * inf = NaN would otherwise leak into reverse mode).
    sq = jnp.sqrt(jnp.where(front, det, 1.0))
    t = 0.5 * (-b - sq)
    valid = front & (t > _T_MIN)
    return jnp.where(valid, t, MISS_T)


def wall_hit_ts(walls: Walls, o: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Ray-wall (finite rectangle) hit distances, ``[P, M]`` (miss = MISS_T).

    Plane test + in-plane bounds check as in scene.cpp:4-35. The in-plane
    basis comes from ``Walls.basis()`` (cross products with z — degenerate for
    z-normal walls, exactly like the reference). Back-face hits keep the
    stored, un-flipped normal (scene.cpp:30), which the shading layer then
    sees — replicated quirk.
    """
    right, up = walls.basis()  # [M, 3] each
    denom = jnp.einsum("pd,md->pm", d, walls.normal)  # [P, M]
    num = jnp.sum(walls.position * walls.normal, axis=-1)[None, :] - jnp.einsum(
        "pd,md->pm", o, walls.normal
    )
    ok = jnp.abs(denom) > 1e-12
    t = num / jnp.where(ok, denom, 1.0)
    point_rel = (
        o[:, None, :] + d[:, None, :] * t[..., None] - walls.position[None, :, :]
    )  # [P, M, 3]
    px = jnp.sum(point_rel * right[None], axis=-1)
    py = jnp.sum(point_rel * up[None], axis=-1)
    valid = (
        ok
        & (t > _T_MIN)
        & (px >= 0.0)
        & (px <= walls.length[None, :])
        & (py >= 0.0)
        & (py <= walls.width[None, :])
    )
    return jnp.where(valid, t, MISS_T)


@pytree_dataclass
class HitRecord:
    """Per-ray closest-hit result (rebuild of ``Collision``, scene.h:27-33).

    ``hit`` replaces the reference's ``hit_object_index < 0`` convention;
    ``normal`` is unit length (the reference leaves sphere normals at radius
    length, scene.cpp:77, but normalizes them inside every shading call);
    ``material`` is already gathered per ray so shading is pure elementwise.
    """

    t: jnp.ndarray  # f32[P] distance (MISS_T on miss)
    hit: jnp.ndarray  # bool[P]
    point: jnp.ndarray  # f32[P, 3] hit position (garbage-but-finite on miss)
    normal: jnp.ndarray  # f32[P, 3] unit normal (arbitrary on miss)
    material: Materials  # per-ray gathered material
    prim_index: jnp.ndarray  # i32[P] global primitive index (-1 on miss)


def _fold_min(
    hit_ts_fn,
    prims,
    o: jnp.ndarray,
    d: jnp.ndarray,
    n: int,
    base: int,
    carry: tuple[jnp.ndarray, jnp.ndarray],
    chunk: int,
):
    """Fold (min-t, argmin global index) over primitive chunks.

    ``hit_ts_fn(prims_chunk, o, d) -> [P, C]``; first-closer-wins tie
    handling matches find_closest_hit's strict `<` update (main.cpp:77).
    """
    best_t, best_i = carry

    def update(bt, bi, ts, base_idx):
        tc = jnp.min(ts, axis=-1)
        ic = jnp.argmin(ts, axis=-1).astype(jnp.int32) + base_idx
        upd = tc < bt
        return jnp.where(upd, tc, bt), jnp.where(upd, ic, bi)

    if n <= chunk:
        return update(best_t, best_i, hit_ts_fn(prims, o, d), jnp.int32(base))

    k = -(-n // chunk)
    pad = k * chunk - n
    # Pad with never-hit primitives (see _pad_* below), reshape to [K, C, ...]
    # and fold sequentially; each step touches only a [P, C] tile.
    prims_p = jax.tree_util.tree_map(
        lambda x: jnp.reshape(
            jnp.concatenate([x, _pad_rows(x, pad)], axis=0), (k, chunk) + x.shape[1:]
        ),
        prims,
    )
    bases = base + jnp.arange(k, dtype=jnp.int32) * chunk

    def body(c, xs):
        bt, bi = c
        pchunk, base_idx = xs
        return update(bt, bi, hit_ts_fn(pchunk, o, d), base_idx), None

    (best_t, best_i), _ = jax.lax.scan(body, (best_t, best_i), (prims_p, bases))
    return best_t, best_i


def _pad_rows(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    """Padding rows whose primitives can never be hit.

    Zeros work for both primitive types: a radius-0 sphere at the ray origin's
    world (c = |oc|^2 > 0 in practice; even if det >= 0 the t <= 0 test
    rejects), and a 0x0 wall rejects on the bounds test — but to be airtight
    spheres are padded via center at +1e8 which forces det < 0 for any ray.
    """
    if x.ndim == 2 and x.shape[1] == 3:  # positions/centers/normals/colors
        return jnp.full((pad, x.shape[1]), 1e8, x.dtype)
    return jnp.zeros((pad,) + x.shape[1:], x.dtype)


def _select_materials(pred: jnp.ndarray, a: Materials, b: Materials) -> Materials:
    return jax.tree_util.tree_map(
        lambda x, y: jnp.where(pred[..., None] if x.ndim == 2 else pred, x, y), a, b
    )


def closest_hit(
    scene: Scene, o: jnp.ndarray, d: jnp.ndarray, *, prim_chunk: int = 128
) -> HitRecord:
    """Closest hit of each ray in ``o, d`` (``[P, 3]``, unit ``d``) vs the scene.

    Rebuild of ``find_closest_hit`` (main.cpp:67-84): the linear scan over a
    heterogeneous object list becomes two chunked min-folds (spheres, then
    walls) over stacked arrays, followed by one gather of the winning
    primitive's normal and material.
    """
    p = o.shape[0]
    n_s, n_w = len(scene.spheres), len(scene.walls)
    best_t = jnp.full((p,), MISS_T, jnp.float32)
    best_i = jnp.full((p,), -1, jnp.int32)

    if n_s:
        best_t, best_i = _fold_min(
            sphere_hit_ts, scene.spheres, o, d, n_s, 0, (best_t, best_i), prim_chunk
        )
    if n_w:
        best_t, best_i = _fold_min(
            wall_hit_ts, scene.walls, o, d, n_w, n_s, (best_t, best_i), prim_chunk
        )

    hit = best_t < MISS_T
    # Keep miss-lane arithmetic finite: clamp t before forming the hit point.
    t_safe = jnp.where(hit, best_t, 1.0)
    point = o + d * t_safe[:, None]

    if n_s and n_w:
        is_sphere = best_i < n_s
        si = jnp.clip(best_i, 0, n_s - 1)
        wi = jnp.clip(best_i - n_s, 0, n_w - 1)
        center = jnp.take(scene.spheres.center, si, axis=0, mode="clip")
        radius = jnp.take(scene.spheres.radius, si, mode="clip")
        sph_n = (point - center) / jnp.maximum(radius, 1e-12)[:, None]
        wall_n = jnp.take(scene.walls.normal, wi, axis=0, mode="clip")
        normal = jnp.where(is_sphere[:, None], sph_n, wall_n)
        material = _select_materials(
            is_sphere,
            scene.spheres.material.take(si),
            scene.walls.material.take(wi),
        )
    elif n_s:
        si = jnp.clip(best_i, 0, n_s - 1)
        center = jnp.take(scene.spheres.center, si, axis=0, mode="clip")
        radius = jnp.take(scene.spheres.radius, si, mode="clip")
        normal = (point - center) / jnp.maximum(radius, 1e-12)[:, None]
        material = scene.spheres.material.take(si)
    elif n_w:
        wi = jnp.clip(best_i, 0, n_w - 1)
        normal = jnp.take(scene.walls.normal, wi, axis=0, mode="clip")
        material = scene.walls.material.take(wi)
    else:
        normal = jnp.zeros_like(o).at[:, 2].set(1.0)
        material = Materials.create(jnp.zeros((1, 3), jnp.float32)).take(
            jnp.zeros((p,), jnp.int32)
        )

    # Miss lanes would otherwise carry a garbage "sphere normal"
    # (point - center)/radius of magnitude >> 1; the shading pow then
    # overflows to inf, and although the forward `where(hit, ...)` masks it,
    # the backward pass would see 0 * inf = NaN. Force a unit normal.
    normal = jnp.where(hit[:, None], normal, jnp.array([0.0, 0.0, 1.0], jnp.float32))

    return HitRecord(
        t=best_t,
        hit=hit,
        point=point,
        normal=normal,
        material=material,
        prim_index=jnp.where(hit, best_i, -1),
    )
