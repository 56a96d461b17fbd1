"""The fused TPU hot path: SoA closest-hit fold, shading, and bounce loop.

This is the performance-critical rebuild of the reference's entire frame
stack — ``rt_scene`` -> ``recursive_ray_tracing`` -> ``find_closest_hit`` ->
``Sphere/Wall::intersect`` -> shading (main.cpp:28-139, scene.cpp:4-78) — in
the layout the VPU wants:

* every per-ray quantity is a component array in image layout ``[rows, W]``
  (width rides the 128-lane axis; see core/v3.py for the measured rationale);
* the primitive loop is python-unrolled (chunk-scanned above ``prim_unroll``)
  so XLA fuses the whole fold into one kernel with a running
  (min-t, argmin-index) carry — no ``[P, N]`` candidate matrix ever exists;
* the bounce "recursion" is a python-unrolled loop over ``depth + 1`` shading
  levels (the reference recursion linearized front-to-back, main.cpp:89-119),
  so one XLA fusion covers raygen -> N bounces -> tone map.

Gradients flow through everything; miss lanes are double-where guarded so
reverse-mode never sees 0 * inf.
"""

from __future__ import annotations

import functools
import contextvars
import os
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from raytracer_tpu.core.types import Camera, Lights, Scene, Sky
from raytracer_tpu.core.v3 import V3
from raytracer_tpu.ops.raygen import camera_frame

__all__ = [
    "MISS_T",
    "SoAHit",
    "raygen_tile",
    "closest_hit_soa",
    "shade_soa",
    "background_soa",
    "trace_soa",
    "render_tile",
]

MISS_T = 1e30  # large finite miss sentinel (never inf: inf breeds NaN grads)
_REFLECT_EPS = 1e-4  # secondary-ray origin offset (reference: main.cpp:111)


def _inside_shard_map(x) -> bool:
    """True when tracing under jax.shard_map (x carries varying mesh axes).

    Pallas kernels cannot run under shard_map's varying-axes checking
    (mixed-vma scalar-prefetch indexing is rejected), so the Pallas paths
    fall back to the fused-XLA fold there — the per-shard work is already
    one device's tile, and the sharded renderer's exactness tests pin that
    path."""
    try:
        return bool(getattr(jax.typeof(x), "vma", None))
    except Exception:
        return False


class SoAHit(NamedTuple):
    """Per-ray closest hit, all fields in image layout ``[rows, W]``.

    The SoA rebuild of the reference's ``Collision`` + material lookup
    (scene.h:27-33, main.cpp:96-104): geometry and the *gathered* winning
    material, ready for pure elementwise shading.
    """

    t: jnp.ndarray
    hit: jnp.ndarray  # bool
    point: V3
    normal: V3  # unit; fixed (0,0,1) on miss lanes (NaN-grad guard)
    prim_index: jnp.ndarray  # i32 global index, -1 on miss
    color: V3
    ambient: jnp.ndarray
    metallic: jnp.ndarray
    diffuse: jnp.ndarray
    specular: jnp.ndarray
    specular_exponent: jnp.ndarray


# ---------------------------------------------------------------------------
# Ray generation (reference: rt_scene loop header, main.cpp:129-134)
# ---------------------------------------------------------------------------


def raygen_tile(
    camera: Camera, width: int, height: int, row_offset=0, rows: int | None = None
) -> tuple[V3, V3]:
    """Primary rays for rows ``[row_offset, row_offset+rows)`` of the image.

    Returns ``(origin, direction)``: origin is a V3 of scalars (pinhole),
    direction a V3 of ``[rows, W]`` unit components. Replicates the
    reference's ``position - pixel_center`` direction flip (main.cpp:133).
    """
    rows = height if rows is None else rows
    frame = camera_frame(camera, width, height)
    tl = V3.from_stacked(frame.image_top_left)
    dx = V3.from_stacked(frame.pixel_delta_x)
    dy = V3.from_stacked(frame.pixel_delta_y)
    origin = V3.from_stacked(frame.origin)

    jj = jnp.arange(width, dtype=jnp.float32)[None, :]  # [1, W]
    ii = jnp.arange(rows, dtype=jnp.float32)[:, None] + row_offset  # [rows, 1]
    pc = V3(
        tl.x + dx.x * jj + dy.x * ii,
        tl.y + dx.y * jj + dy.y * ii,
        tl.z + dx.z * jj + dy.z * ii,
    )
    d = (origin - pc).normalized()
    return origin, d


# ---------------------------------------------------------------------------
# Closest-hit fold (reference: find_closest_hit, main.cpp:67-84;
# Sphere::intersect, scene.cpp:40-78; Wall::intersect, scene.cpp:4-35)
# ---------------------------------------------------------------------------


def _sphere_update(o: V3, d: V3, best, i, cx, cy, cz, r2):
    """Fold one sphere into the (best_t, best_i) carry.

    Quadratic with a = |d|^2 = 1 folded out (unit directions): the nearer
    root, accepted iff det >= 0 and t > 0 and strictly closer (main.cpp:77).
    """
    best_t, best_i = best
    ocx, ocy, ocz = o.x - cx, o.y - cy, o.z - cz
    b = 2.0 * (d.x * ocx + d.y * ocy + d.z * ocz)
    c = ocx * ocx + ocy * ocy + ocz * ocz - r2
    det = b * b - 4.0 * c
    front = det >= 0.0
    sq = jnp.sqrt(jnp.where(front, det, 1.0))  # double-where: finite d/d(det)
    t = 0.5 * (-b - sq)
    win = front & (t > 0.0) & (t < best_t)
    return jnp.where(win, t, best_t), jnp.where(win, i, best_i)


def _wall_update(o: V3, d: V3, best, i, w):
    """Fold one wall (finite rectangle) into the carry.

    ``w`` is a dict of per-wall scalars: unit normal n, in-plane basis
    (right, up) from cross products with z (scene.cpp:18-19 — degenerate for
    z-parallel normals, replicated), corner p, extents. Back-face normals
    stay un-flipped (scene.cpp:30).
    """
    best_t, best_i = best
    denom = d.x * w["nx"] + d.y * w["ny"] + d.z * w["nz"]
    num = w["dplane"] - (o.x * w["nx"] + o.y * w["ny"] + o.z * w["nz"])
    ok = jnp.abs(denom) > 1e-12
    t = num / jnp.where(ok, denom, 1.0)
    relx = o.x + d.x * t - w["px"]
    rely = o.y + d.y * t - w["py"]
    relz = o.z + d.z * t - w["pz"]
    u = relx * w["rx"] + rely * w["ry"] + relz * w["rz"]
    v = relx * w["ux"] + rely * w["uy"] + relz * w["uz"]
    win = (
        ok
        & (t > 0.0)
        & (u >= 0.0)
        & (u <= w["length"])
        & (v >= 0.0)
        & (v <= w["width"])
        & (t < best_t)
    )
    return jnp.where(win, t, best_t), jnp.where(win, i, best_i)


def _fold_spheres(spheres, o: V3, d: V3, best, base: int, unroll: int):
    """All spheres into the carry: unrolled, or chunk-scanned above ``unroll``.

    Unrolling keeps the whole fold one XLA fusion (measured ~6x over
    ``lax.scan``-per-primitive); the chunked scan bounds compile time for
    1000+-sphere scenes while still unrolling ``unroll`` primitives per step.
    """
    n = len(spheres)
    cx, cy, cz = spheres.center[:, 0], spheres.center[:, 1], spheres.center[:, 2]
    r2 = spheres.radius * spheres.radius
    if n <= unroll:
        for k in range(n):
            best = _sphere_update(
                o, d, best, jnp.int32(base + k), cx[k], cy[k], cz[k], r2[k]
            )
        return best

    k_chunks = -(-n // unroll)
    pad = k_chunks * unroll - n

    def pad_to(x, fill):
        return jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)]) if pad else x

    # Pad with never-hit spheres: center at 1e8 makes det < 0 for real rays.
    xs = (
        pad_to(cx, 1e8).reshape(k_chunks, unroll),
        pad_to(cy, 1e8).reshape(k_chunks, unroll),
        pad_to(cz, 1e8).reshape(k_chunks, unroll),
        pad_to(r2, 0.0).reshape(k_chunks, unroll),
        base + jnp.arange(k_chunks, dtype=jnp.int32) * unroll,
    )

    def body(carry, x):
        cxc, cyc, czc, r2c, b0 = x
        for k in range(unroll):
            carry = _sphere_update(o, d, carry, b0 + k, cxc[k], cyc[k], czc[k], r2c[k])
        return carry, None

    best, _ = jax.lax.scan(body, best, xs)
    return best


def _box_update(o: V3, d: V3, inv: V3, best, i, mnx, mny, mnz, mxx, mxy, mxz):
    """Fold one axis-aligned box into the carry (branchless slab test).

    ``inv`` is the precomputed safe reciprocal direction (hoisted out of the
    primitive loop). Entry distance t_near accepted iff t_near <= t_far and
    t_near > 0 — outside hits only, like the spheres' nearer root.
    """
    best_t, best_i = best
    t1x, t2x = (mnx - o.x) * inv.x, (mxx - o.x) * inv.x
    t1y, t2y = (mny - o.y) * inv.y, (mxy - o.y) * inv.y
    t1z, t2z = (mnz - o.z) * inv.z, (mxz - o.z) * inv.z
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.minimum(t1z, t2z),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.maximum(t1z, t2z),
    )
    win = (tn <= tf) & (tn > 0.0) & (tn < best_t)
    return jnp.where(win, tn, best_t), jnp.where(win, i, best_i)


def _safe_inv(d: V3) -> V3:
    """1/d with axis-parallel components clamped to a huge finite value.

    Keeps the slab test's min/max algebra NaN-free (inf - inf never forms)
    while preserving semantics: a 1e30-scaled slab distance loses against
    any real hit and fails the t_near <= t_far test when outside the slab.
    """
    def inv(c):
        ok = jnp.abs(c) > 1e-12
        # Sign-preserving fill: sign(c)*BIG would give 0 for c in (-eps, 0]
        # (sign(-tiny)*1e30 + 1e30 == 0), collapsing that slab axis to (0,0)
        # and wrongly rejecting boxes. c >= 0 keeps the fill huge either way.
        return jnp.where(ok, 1.0 / jnp.where(ok, c, 1.0),
                         jnp.where(c >= 0.0, 1e30, -1e30))

    return V3(inv(d.x), inv(d.y), inv(d.z))


def _fold_boxes(boxes, o: V3, d: V3, best, base: int, unroll: int):
    """All boxes into the carry (unrolled; chunk-scanned above ``unroll``)."""
    n = len(boxes)
    inv = _safe_inv(d)
    mn, mx = boxes.minimum, boxes.maximum
    cols = (mn[:, 0], mn[:, 1], mn[:, 2], mx[:, 0], mx[:, 1], mx[:, 2])
    if n <= unroll:
        for k in range(n):
            best = _box_update(
                o, d, inv, best, jnp.int32(base + k), *[c[k] for c in cols]
            )
        return best

    k_chunks = -(-n // unroll)
    pad = k_chunks * unroll - n

    def pad_to(x):
        # Degenerate boxes at +1e8 (min == max far away): t_near > t_far
        # never holds for real rays after the t_near > 0 test.
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), 1e8, x.dtype)])
        return x.reshape(k_chunks, unroll)

    xs = tuple(pad_to(c) for c in cols) + (
        base + jnp.arange(k_chunks, dtype=jnp.int32) * unroll,
    )

    def body(carry, x):
        *cs, b0 = x
        for k in range(unroll):
            carry = _box_update(o, d, inv, carry, b0 + k, *[c[k] for c in cs])
        return carry, None

    best, _ = jax.lax.scan(body, best, xs)
    return best


def box_winner_normal(boxes, bi: jnp.ndarray, o: V3, d: V3) -> V3:
    """Outward face normal of the entry face for per-ray box winners."""
    inv = _safe_inv(d)
    mnx, mny, mnz = [_take(boxes.minimum[:, k], bi) for k in range(3)]
    mxx, mxy, mxz = [_take(boxes.maximum[:, k], bi) for k in range(3)]
    tx = (jnp.where(d.x >= 0, mnx, mxx) - o.x) * inv.x
    ty = (jnp.where(d.y >= 0, mny, mxy) - o.y) * inv.y
    tz = (jnp.where(d.z >= 0, mnz, mxz) - o.z) * inv.z
    is_x = (tx >= ty) & (tx >= tz)
    is_y = jnp.logical_not(is_x) & (ty >= tz)
    is_z = jnp.logical_not(is_x) & jnp.logical_not(is_y)
    return V3(
        jnp.where(is_x, -jnp.sign(d.x), 0.0),
        jnp.where(is_y, -jnp.sign(d.y), 0.0),
        jnp.where(is_z, -jnp.sign(d.z), 0.0),
    )


def _wall_tables(walls) -> dict:
    """Per-wall scalars for the fold (basis per scene.cpp:18-19)."""
    n = V3.from_stacked(walls.normal)
    z = V3(
        jnp.zeros_like(n.x), jnp.zeros_like(n.x), jnp.ones_like(n.x)
    )
    right = n.cross(z).normalized()
    up = right.cross(n).normalized()
    p = V3.from_stacked(walls.position)
    return {
        "nx": n.x, "ny": n.y, "nz": n.z,
        "rx": right.x, "ry": right.y, "rz": right.z,
        "ux": up.x, "uy": up.y, "uz": up.z,
        "px": p.x, "py": p.y, "pz": p.z,
        "dplane": p.dot(n),
        "length": walls.length,
        "width": walls.width,
    }


def _fold_walls(walls, o: V3, d: V3, best, base: int):
    tab = _wall_tables(walls)
    for k in range(len(walls)):
        wk = {key: val[k] for key, val in tab.items()}
        best = _wall_update(o, d, best, jnp.int32(base + k), wk)
    return best


def fold_closest_jnp(
    scene: Scene, o: V3, d: V3, *, prim_unroll: int = 64
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(min-t, argmin global index) of every ray vs the scene, pure jnp.

    The linear virtual-dispatch scan of the reference (main.cpp:67-84) as two
    fused min-folds. Global primitive numbering: spheres ``[0, n_s)``, then
    walls.
    """
    n_s, n_w = len(scene.spheres), len(scene.walls)
    # Derive the carry init arithmetically from the rays (not via jnp.full)
    # so it inherits their varying-axes type under shard_map and the chunked
    # sphere scan's carry type-checks.
    zero = (o.x + d.x) * 0.0
    best = (zero + MISS_T, zero.astype(jnp.int32) - 1)
    if n_s:
        best = _fold_spheres(scene.spheres, o, d, best, 0, prim_unroll)
    if n_w:
        best = _fold_walls(scene.walls, o, d, best, n_s)
    if len(scene.boxes):
        best = _fold_boxes(scene.boxes, o, d, best, n_s + n_w, prim_unroll)
    return best


def _winner_t(
    scene: Scene, o: V3, d: V3, best_t: jnp.ndarray, best_i: jnp.ndarray
) -> jnp.ndarray:
    """Differentiable re-evaluation of the winning primitive's hit distance.

    The fold itself runs under ``stop_gradient`` (selection is a discrete
    argmin — zero gradient a.e.); gradients flow through this O(rays)
    recompute of t for the *winner only*, instead of transposing the whole
    O(rays x prims) fold. Also what makes a gradient-free Pallas fold
    drop-in: the backward pass never needs the fold's VJP.
    """
    n_s, n_w, n_b = len(scene.spheres), len(scene.walls), len(scene.boxes)
    hit = best_t < MISS_T

    t = best_t  # miss lanes: constant MISS_T (stop-gradded by caller)
    if n_s:
        si = jnp.clip(best_i, 0, n_s - 1)
        c = _take3(scene.spheres.center, si)
        r = _take(scene.spheres.radius, si)
        oc = o - c
        b = 2.0 * d.dot(oc)
        cc = oc.norm2() - r * r
        det = b * b - 4.0 * cc
        # STRICT > 0: miss lanes gather all-zero attributes, making det
        # exactly 0 with the camera at the origin; sqrt'(0) = inf then
        # meets a zero cotangent (0 * inf = NaN) in reverse mode. Mirrors
        # pallas_fold._record_math (VJP pairing).
        pos = det > 0.0
        sq = jnp.sqrt(jnp.where(pos, det, 1.0))
        t_s = jnp.where(pos, 0.5 * (-b - sq), 1.0)
        # `& pos`: at grazing hits the fold's discriminant (different FMA
        # association) can be >=0 while this recompute's is <0 — selecting
        # the 1.0 placeholder there puts the hit point far off the surface
        # and the non-unit normal blows the shading pow up to inf
        # (observed: ~15 px per 1080p frame on the v5e). Fall back to the
        # fold's exact t (constant wrt params — zero gradient on a
        # measure-zero set of grazing pixels).
        is_sphere = hit & (best_i < n_s)
        t = jnp.where(is_sphere & pos, t_s, t)
    if n_w:
        wi = jnp.clip(best_i - n_s, 0, n_w - 1)
        n = _take3(scene.walls.normal, wi)
        p = _take3(scene.walls.position, wi)
        denom = d.dot(n)
        ok = jnp.abs(denom) > 1e-12
        t_w = (p - o).dot(n) / jnp.where(ok, denom, 1.0)
        is_wall = hit & (best_i >= n_s) & (best_i < n_s + n_w)
        t = jnp.where(is_wall, jnp.where(ok, t_w, best_t), t)
    if n_b:
        bi = jnp.clip(best_i - n_s - n_w, 0, n_b - 1)
        inv = _safe_inv(d)
        mn = _take3(scene.boxes.minimum, bi)
        mx = _take3(scene.boxes.maximum, bi)
        t_b = jnp.maximum(
            jnp.maximum(
                jnp.minimum((mn.x - o.x) * inv.x, (mx.x - o.x) * inv.x),
                jnp.minimum((mn.y - o.y) * inv.y, (mx.y - o.y) * inv.y),
            ),
            jnp.minimum((mn.z - o.z) * inv.z, (mx.z - o.z) * inv.z),
        )
        is_box = hit & (best_i >= n_s + n_w)
        t = jnp.where(is_box, t_b, t)
    return t


def _kernel_hit_record(scene, o, d, active) -> SoAHit:
    """SoAHit straight from the Pallas shortlist-hit kernel (forward only)."""
    from raytracer_tpu.ops.pallas_fold import hit_closest_pallas_shortlist

    (t, bi, hpx, hpy, hpz, hnx, hny, hnz, colr, colg, colb, amb, met, dif,
     spe, exq) = hit_closest_pallas_shortlist(scene, o, d, active=active)
    hit = t < MISS_T
    return SoAHit(
        t=t, hit=hit, point=V3(hpx, hpy, hpz), normal=V3(hnx, hny, hnz),
        prim_index=bi, color=V3(colr, colg, colb), ambient=amb,
        metallic=met, diffuse=dif, specular=spe, specular_exponent=exq,
    )


@jax.custom_vjp
def _pallas_hit(scene, o, d, active):
    """Kernel-forward hit record with the `_mm_hit` backward.

    Forward: the shortlist kernel emits the full record in one pass —
    no separate attribute gather. Backward: differentiate the
    formula-mirrored `_mm_hit` at the kernel's (t, index) selection
    (selection itself is gradient-free, like every fold here).
    """
    return _kernel_hit_record(scene, o, d, active)


def _pallas_hit_fwd(scene, o, d, active):
    rec = _kernel_hit_record(scene, o, d, active)
    return rec, (scene, o, d, rec.t, rec.prim_index, active)


def _pallas_hit_bwd(res, ct):
    import numpy as np

    scene, o, d, best_t, best_i, active = res
    _, vjp = jax.vjp(
        lambda a, b, c: _mm_hit(a, b, c, best_t, best_i), scene, o, d
    )
    g_scene, g_o, g_d = vjp(ct)
    g_active = (
        None if active is None
        else np.zeros(active.shape, dtype=jax.dtypes.float0)
    )
    return (g_scene, g_o, g_d, g_active)


_pallas_hit.defvjp(_pallas_hit_fwd, _pallas_hit_bwd)


def closest_hit_soa(
    scene: Scene,
    o: V3,
    d: V3,
    *,
    prim_unroll: int = 64,
    fold_fn: Callable | None = None,
    active: jnp.ndarray | None = None,
) -> SoAHit:
    """Closest hit of each ray: gradient-free fold + differentiable regather.

    ``fold_fn(scene, o, d) -> (best_t, best_i)`` selects the winning
    primitive (default: the fused jnp fold; the Pallas kernel slots in
    here). It runs on stop-gradiented inputs; the winner's t, hit point,
    normal, and material are then recomputed/gathered differentiably.

    ``active`` (optional bool mask, same shape as the rays): lanes with
    zero path throughput — folds that understand it (the shortlist Pallas
    fold) may skip work for them and return arbitrary miss records there.
    """
    import inspect

    sg = jax.lax.stop_gradient
    scene_sg, o_sg, d_sg = jax.tree_util.tree_map(sg, (scene, o, d))
    if (
        getattr(fold_fn, "_emits_hit_record", False)
        and scene.num_primitives >= _MM_GATHER_MIN_PRIMS
        and _USE_CUSTOM_TAKE()
        and not _inside_shard_map(d.x)
    ):
        # The shortlist-hit kernel produces the FULL record in one pass —
        # the mm attribute gather (~3.2 ms/level at 1080p/1024 spheres)
        # disappears from the forward; backward still differentiates
        # _mm_hit via the custom VJP. Falls through to the classic path
        # under builtin_take_transpose (shard_map inference can't see
        # through custom_vjp) and under shard_map generally (Pallas cannot
        # run below its varying-axes checking).
        return _pallas_hit(
            scene, o, d, None if active is None else sg(active)
        )
    if fold_fn is None:
        best_t, best_i = fold_closest_jnp(
            scene_sg, o_sg, d_sg, prim_unroll=prim_unroll
        )
    elif active is not None and "active" in inspect.signature(fold_fn).parameters:
        best_t, best_i = fold_fn(scene_sg, o_sg, d_sg, active=sg(active))
    else:
        best_t, best_i = fold_fn(scene_sg, o_sg, d_sg)
    if scene.num_primitives >= _MM_GATHER_MIN_PRIMS:
        # The mm path is matmul-based in both directions — no special VJP.
        return _mm_hit(scene, o, d, best_t, best_i)

    if not _USE_CUSTOM_TAKE():
        t = _winner_t(scene, o, d, best_t, best_i)
        return gather_hit(scene, o, d, t, best_i)

    # Small scenes: the fused take-based primal is the fast forward, but the
    # native take TRANSPOSE (scatter-add) lowers to ~O(rays) serial updates
    # on this backend (55 GB / 20x-fwd backward measured). Wrapping a
    # custom_vjp around an individual take would box it out of fusion and
    # wreck the forward instead — so the box goes around the WHOLE hit
    # record, and the backward differentiates the value-identical matmul
    # implementation (_mm_hit).
    return _boxed_hit(scene, o, d, best_t, best_i)


def _hit_fwd(scene, o, d, best_t, best_i):
    return _boxed_hit(scene, o, d, best_t, best_i), (scene, o, d, best_t, best_i)


def _hit_bwd(res, ct):
    import numpy as np

    scene, o, d, best_t, best_i = res
    _, vjp = jax.vjp(
        lambda a, b, c: _mm_hit(a, b, c, best_t, best_i), scene, o, d
    )
    g_scene, g_o, g_d = vjp(ct)
    return (
        g_scene, g_o, g_d,
        jnp.zeros_like(best_t),
        np.zeros(best_i.shape, dtype=jax.dtypes.float0),
    )


@jax.custom_vjp
def _boxed_hit(scene, o, d, best_t, best_i):
    """Take-based hit record with the matmul-implementation backward.

    Primal: the fully-fused take path (fast forward). Backward:
    differentiate the value-identical ``_mm_hit`` (matmul gathers), because
    the native take transpose lowers catastrophically here. best_t/best_i
    come from the stop-gradiented fold and carry zero cotangents.
    """
    t = _winner_t(scene, o, d, best_t, best_i)
    return gather_hit(scene, o, d, t, best_i)


_boxed_hit.defvjp(_hit_fwd, _hit_bwd)




# From this many primitives up, winner attributes come from a single one-hot
# matmul on the MXU instead of per-field jnp.take: on this backend a gather
# with a runtime-computed index lowers to O(table_N) full-image passes
# (measured 8.7 GB traffic for ONE take from a 1027-entry table at 1080p;
# 14 takes = 210 ms), while the fused one-hot matmul moves 0.03 GB and runs
# in ~4 ms — and it is differentiable w.r.t. the table, so material/geometry
# gradients flow exactly like through a gather.
_MM_GATHER_MIN_PRIMS = 32

# Packed attribute-table columns (one row per primitive):
#   0-2 color | 3 ambient | 4 metallic | 5 diffuse | 6 specular | 7 exponent
#   8-13 geometry: sphere (center xyz, radius, 0, 0)
#                  wall   (unit normal xyz, corner position xyz)
#                  box    (min corner xyz, max corner xyz)
_PACK_D = 14


def _packed_table(scene: Scene) -> jnp.ndarray:
    """The [N_total, 14] per-primitive attribute table (differentiable)."""
    parts = []
    s, w, b = scene.spheres, scene.walls, scene.boxes
    if len(s):
        m = s.material
        parts.append(jnp.concatenate([
            m.color, m.ambient[:, None], m.metallic[:, None],
            m.diffuse[:, None], m.specular[:, None],
            m.specular_exponent[:, None],
            s.center, s.radius[:, None], jnp.zeros((len(s), 2), jnp.float32),
        ], axis=1))
    if len(w):
        m = w.material
        parts.append(jnp.concatenate([
            m.color, m.ambient[:, None], m.metallic[:, None],
            m.diffuse[:, None], m.specular[:, None],
            m.specular_exponent[:, None],
            w.normal, w.position,
        ], axis=1))
    if len(b):
        m = b.material
        parts.append(jnp.concatenate([
            m.color, m.ambient[:, None], m.metallic[:, None],
            m.diffuse[:, None], m.specular[:, None],
            m.specular_exponent[:, None],
            b.minimum, b.maximum,
        ], axis=1))
    return parts[0] if len(parts) == 1 else jnp.concatenate(parts, axis=0)


def _onehot_matmul_gather(table: jnp.ndarray, idx: jnp.ndarray) -> list:
    """[N, D] table x [...] int idx -> list of D [...] arrays, via the MXU.

    The one-hot operand fuses into the dot (never materialized); f32
    accumulation keeps geometry attributes exact to f32 rounding.
    """
    n = table.shape[0]
    flat = idx.reshape(-1)
    # bf16 one-hot: 0/1 are exact in bf16 and the DEFAULT-precision operand
    # is consumed as bf16 by the MXU anyway — but materializing it as f32
    # made XLA stage a [P, N] f32 buffer through HBM (1 GB at 1080p x 128
    # rows, ~2.5 ms); bf16 halves that, value-identically.
    oh = (flat[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :]).astype(
        jnp.bfloat16
    )
    # Per-operand precision: the one-hot operand is exactly representable in
    # bf16 (0/1), so only the table needs the f32 bf16-triple split — the
    # result is still EXACT (each one-hot row sums one table entry's split:
    # hi + mid + lo == value; verified maxerr 0.0 vs HIGHEST on the v5e),
    # at half the MXU passes. Plain DEFAULT would round the table through
    # bf16 (measured 3.9e-3 abs error on O(1) geometry values), skewing
    # every >=32-prim hit record AND making the custom-VJP backward
    # differentiate a not-value-identical function.
    attrs = jnp.dot(
        oh,
        table,
        preferred_element_type=jnp.float32,
        precision=(jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST),
    )  # [P, D]
    return [attrs[:, k].reshape(idx.shape) for k in range(table.shape[1])]


@jax.custom_vjp
def _gather_planes(table: jnp.ndarray, idx: jnp.ndarray) -> tuple:
    """Differentiable per-ray row gather from a packed [N, D] table.

    Forward engine by size: column-wise takes below
    `_MM_GATHER_MIN_PRIMS` (the one-hot matmul costs ~3 ms/level at 1080p
    even for 3 rows because the MXU pads K/N to 128; takes fuse), the
    one-hot MXU matmul above (the take lowering is O(N) image passes).
    Backward: the EXPLICIT one-hot transpose matmul — the gather is
    linear in the table, so no forward replay is needed (a plain
    ``jax.vjp`` of the matmul would redundantly run the gather again
    just to discard it). Values are identical both ways (one-hot rows
    sum exactly one table entry; mode="clip" matches the pre-clipped
    idx).
    """
    if table.shape[0] >= _MM_GATHER_MIN_PRIMS:
        return tuple(_onehot_matmul_gather(table, idx))
    flat = idx.reshape(-1)
    return tuple(
        jnp.take(table[:, k], flat, mode="clip").reshape(idx.shape)
        for k in range(table.shape[1])
    )


def _gather_planes_fwd(table, idx):
    return _gather_planes(table, idx), (table.shape, idx)


def _gather_planes_bwd(res, ct):
    import numpy as np

    (n, d), idx = res
    flat = idx.reshape(-1)
    oh = (flat[:, None] == jnp.arange(n, dtype=jnp.int32)[None, :]).astype(
        jnp.bfloat16
    )  # bf16: exact for 0/1, halves the staged [P, N] buffer
    ct_stack = jnp.stack([c.reshape(-1) for c in ct], axis=1)  # [P, D]
    g_table = jnp.dot(
        oh.T,
        ct_stack,
        preferred_element_type=jnp.float32,
        # one-hot exact in bf16; the cotangent gets the f32 triple split
        # (mirrors _onehot_matmul_gather's per-operand precision).
        precision=(jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST),
    )
    return g_table, np.zeros(idx.shape, dtype=jax.dtypes.float0)


_gather_planes.defvjp(_gather_planes_fwd, _gather_planes_bwd)


def _mm_hit(
    scene: Scene, o: V3, d: V3, best_t: jnp.ndarray, best_i: jnp.ndarray
) -> SoAHit:
    """Large-scene hit record: packed-attribute matmul + per-type winner math.

    Replaces both the per-field gathers and ``_winner_t``'s re-gathers with
    ONE differentiable one-hot matmul; the winner's t/normal are then
    recomputed from the packed geometry columns with branchless type selects
    (types are static index ranges: spheres, then walls, then boxes).
    """
    n_s, n_w, n_b = len(scene.spheres), len(scene.walls), len(scene.boxes)
    n_tot = n_s + n_w + n_b
    hit = best_t < MISS_T
    idx = jnp.clip(best_i, 0, n_tot - 1)

    a = _onehot_matmul_gather(_packed_table(scene), idx)
    color = V3(a[0], a[1], a[2])
    ambient, metallic, diffuse, specular, exponent = a[3], a[4], a[5], a[6], a[7]
    g = a[8:14]

    is_sphere = idx < n_s
    is_wall = (idx >= n_s) & (idx < n_s + n_w)
    is_box = idx >= n_s + n_w

    # --- differentiable winner t per type (see _winner_t for the small-N
    # take-based equivalent) ---
    t = best_t
    if n_s:
        c = V3(g[0], g[1], g[2])
        r = g[3]
        oc = o - c
        bq = 2.0 * d.dot(oc)
        cq = oc.norm2() - r * r
        det = bq * bq - 4.0 * cq
        pos = det > 0.0  # strict: see _winner_t (0 * inf NaN at det == 0)
        sq = jnp.sqrt(jnp.where(pos, det, 1.0))
        t_s = jnp.where(pos, 0.5 * (-bq - sq), 1.0)
        # `& pos`: see _winner_t — fold/recompute FMA disagreement at
        # grazing hits must fall back to the fold's t, not a placeholder.
        t = jnp.where(hit & is_sphere & pos, t_s, t)
    if n_w:
        nrm = V3(g[0], g[1], g[2])
        pos_w = V3(g[3], g[4], g[5])
        denom = d.dot(nrm)
        ok = jnp.abs(denom) > 1e-12
        t_w = (pos_w - o).dot(nrm) / jnp.where(ok, denom, 1.0)
        t = jnp.where(hit & is_wall & ok, t_w, t)
    if n_b:
        inv = _safe_inv(d)
        mn = V3(g[0], g[1], g[2])
        mx = V3(g[3], g[4], g[5])
        t_b = jnp.maximum(
            jnp.maximum(
                jnp.minimum((mn.x - o.x) * inv.x, (mx.x - o.x) * inv.x),
                jnp.minimum((mn.y - o.y) * inv.y, (mx.y - o.y) * inv.y),
            ),
            jnp.minimum((mn.z - o.z) * inv.z, (mx.z - o.z) * inv.z),
        )
        t = jnp.where(hit & is_box, t_b, t)

    t_safe = jnp.where(hit, t, 1.0)
    point = o + d * t_safe

    # --- normals per type from the same geometry columns ---
    normal = None
    if n_s:
        c = V3(g[0], g[1], g[2])
        normal = (point - c) * (1.0 / jnp.maximum(g[3], 1e-12))
    if n_w:
        wall_n = V3(g[0], g[1], g[2])
        normal = wall_n if normal is None else V3.where(is_sphere, normal, wall_n)
    if n_b:
        inv = _safe_inv(d)
        mn = V3(g[0], g[1], g[2])
        mx = V3(g[3], g[4], g[5])
        tx = (V3.where(d.x >= 0, mn, mx).x - o.x) * inv.x
        ty = (V3.where(d.y >= 0, mn, mx).y - o.y) * inv.y
        tz = (V3.where(d.z >= 0, mn, mx).z - o.z) * inv.z
        bx = (tx >= ty) & (tx >= tz)
        by = jnp.logical_not(bx) & (ty >= tz)
        bz = jnp.logical_not(bx) & jnp.logical_not(by)
        box_n = V3(
            jnp.where(bx, -jnp.sign(d.x), 0.0),
            jnp.where(by, -jnp.sign(d.y), 0.0),
            jnp.where(bz, -jnp.sign(d.z), 0.0),
        )
        normal = box_n if normal is None else V3.where(is_box, box_n, normal)

    unit_z = V3(jnp.zeros_like(best_t), jnp.zeros_like(best_t), jnp.ones_like(best_t))
    normal = V3.where(hit, normal, unit_z)

    return SoAHit(
        t=jnp.where(hit, t, best_t),
        hit=hit,
        point=point,
        normal=normal,
        prim_index=jnp.where(hit, best_i, -1),
        color=color,
        ambient=ambient,
        metallic=metallic,
        diffuse=diffuse,
        specular=specular,
        specular_exponent=exponent,
    )


# Up to this many primitives, winner attributes come from a compare/select
# chain instead of jnp.take. Measured on v5e (1080p, 3-prim demo, depth 3):
# jnp.take 5.84ms/frame vs select-chain 6.48ms — XLA lowers small-table
# gathers well here, so the chain is disabled (kept for backends where
# gathers regress; raise to ~8 to re-enable).
_SELECT_GATHER_MAX = 0


# Trace-time switch: shard_map's varying-axes transpose inference cannot see
# through custom_vjp, so the prim-sharded renderer (parallel/render.py)
# disables the custom-backward hit wrapper inside its hit function (the
# native take transpose is slower but inference-friendly). A ContextVar —
# not a module global — so concurrent traces (threads / nested contexts)
# cannot observe each other's toggles (VERDICT r2 "weak" item 8).
_use_custom_take = contextvars.ContextVar("rt_use_custom_take", default=True)


def _USE_CUSTOM_TAKE() -> bool:
    return _use_custom_take.get()


class builtin_take_transpose:
    """Context manager: use the native take VJP during tracing."""

    def __enter__(self):
        self._tok = _use_custom_take.set(False)

    def __exit__(self, *a):
        _use_custom_take.reset(self._tok)



def _take(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """Per-ray lookup from a small [N] table (select-chain under the cap)."""
    n = table.shape[0]
    if 1 < n <= _SELECT_GATHER_MAX:
        out = jnp.broadcast_to(table[0], idx.shape)
        for k in range(1, n):
            out = jnp.where(idx == k, table[k], out)
        return out
    return jnp.take(table, idx, mode="clip")


def _take3(table: jnp.ndarray, idx: jnp.ndarray) -> V3:
    """Per-ray V3 lookup from a small [N, 3] table."""
    n = table.shape[0]
    if 1 < n <= _SELECT_GATHER_MAX:
        t = V3.from_stacked(table)
        out = V3(
            jnp.broadcast_to(t.x[0], idx.shape),
            jnp.broadcast_to(t.y[0], idx.shape),
            jnp.broadcast_to(t.z[0], idx.shape),
        )
        for k in range(1, n):
            pred = idx == k
            out = V3(
                jnp.where(pred, t.x[k], out.x),
                jnp.where(pred, t.y[k], out.y),
                jnp.where(pred, t.z[k], out.z),
            )
        return out
    return V3.from_stacked(table).take(idx)


def gather_hit(
    scene: Scene, o: V3, d: V3, best_t: jnp.ndarray, best_i: jnp.ndarray
) -> SoAHit:
    """Build the full SoAHit record from a (min-t, argmin-index) fold result."""
    n_s, n_w, n_b = len(scene.spheres), len(scene.walls), len(scene.boxes)
    hit = best_t < MISS_T
    t_safe = jnp.where(hit, best_t, 1.0)
    point = o + d * t_safe

    if n_s + n_w + n_b == 0:  # empty scene: every ray misses into the background
        zeros = jnp.zeros_like(best_t)
        unit_z = V3(zeros, zeros, zeros + 1.0)
        return SoAHit(
            t=best_t, hit=hit, point=point, normal=unit_z,
            prim_index=jnp.full_like(best_t, -1, dtype=jnp.int32),
            color=V3(zeros, zeros, zeros), ambient=zeros, metallic=zeros,
            diffuse=zeros, specular=zeros, specular_exponent=zeros + 1.0,
        )

    smat, wmat = scene.spheres.material, scene.walls.material
    bmat = scene.boxes.material

    def cat(a, b, c):
        parts = [p for p, n in ((a, n_s), (b, n_w), (c, n_b)) if n]
        return parts[0] if len(parts) == 1 else jnp.concatenate(parts)

    idx = jnp.clip(best_i, 0, n_s + n_w + n_b - 1)
    color = _take3(cat(smat.color, wmat.color, bmat.color), idx)
    ambient = _take(cat(smat.ambient, wmat.ambient, bmat.ambient), idx)
    metallic = _take(cat(smat.metallic, wmat.metallic, bmat.metallic), idx)
    diffuse = _take(cat(smat.diffuse, wmat.diffuse, bmat.diffuse), idx)
    specular = _take(cat(smat.specular, wmat.specular, bmat.specular), idx)
    exponent = _take(
        cat(smat.specular_exponent, wmat.specular_exponent,
            bmat.specular_exponent),
        idx,
    )

    normal = None
    if n_s:
        si = jnp.clip(best_i, 0, n_s - 1)
        center = _take3(scene.spheres.center, si)
        radius = _take(scene.spheres.radius, si)
        normal = (point - center) * (1.0 / jnp.maximum(radius, 1e-12))
    if n_w:
        wi = jnp.clip(best_i - n_s, 0, n_w - 1)
        wall_n = _take3(scene.walls.normal, wi)
        normal = wall_n if normal is None else V3.where(best_i < n_s, normal, wall_n)
    if n_b:
        bi = jnp.clip(best_i - n_s - n_w, 0, n_b - 1)
        box_n = box_winner_normal(scene.boxes, bi, o, d)
        normal = (
            box_n
            if normal is None
            else V3.where(best_i < n_s + n_w, normal, box_n)
        )
    if normal is None:
        normal = V3.fill(best_t.shape, 0.0)

    # Miss lanes: force a benign unit normal — their garbage normal would
    # overflow the shading pow to inf and poison gradients via 0 * inf.
    unit_z = V3(jnp.zeros_like(best_t), jnp.zeros_like(best_t), jnp.ones_like(best_t))
    normal = V3.where(hit, normal, unit_z)

    return SoAHit(
        t=best_t,
        hit=hit,
        point=point,
        normal=normal,
        prim_index=jnp.where(hit, best_i, -1),
        color=color,
        ambient=ambient,
        metallic=metallic,
        diffuse=diffuse,
        specular=specular,
        specular_exponent=exponent,
    )


# ---------------------------------------------------------------------------
# Shading (reference: out_color main.cpp:28-37, diffuse_shading main.cpp:42-48,
# specular main.cpp:53-62, combination main.cpp:102-104)
# ---------------------------------------------------------------------------


def background_soa(d: V3, sky: Sky) -> V3:
    """Sky gradient / flat ground for unit directions (main.cpp:28-37)."""
    z = d.z
    z_pos = jnp.where(z > 0.0, z, 1.0)  # double-where: finite pow grads
    grad = jnp.where(z > 0.0, z_pos**sky.gradient_exponent, 0.0)
    horizon = V3.from_stacked(sky.horizon_color)
    zenith = V3.from_stacked(sky.zenith_color)
    ground = V3.from_stacked(sky.ground_color)
    sky_col = V3.lerp(horizon, zenith, grad)
    return V3.where(z < 0.0, ground, sky_col)


def _light_terms(ldir: V3, normal: V3, view: V3, exponent):
    """(diffuse, specular^e) for one light direction (main.cpp:42-62).

    The half-vector normalize is guarded: when the light direction exactly
    opposes the view (view + ldir = 0 — e.g. the soft path's behind-camera
    continuation points), rsqrt(0) would be inf; the guarded lane falls to
    zero specular, the correct grazing limit.
    """
    diffuse = jnp.maximum(ldir.dot(normal), 0.0)
    hv = view + ldir
    n2 = hv.norm2()
    half = hv * jax.lax.rsqrt(jnp.where(n2 > 1e-12, n2, 1.0))
    base = jnp.maximum(half.dot(normal), 0.0)
    base_safe = jnp.where(base > 0.0, base, 1.0)  # 0**e has infinite d/d(base)
    specular = jnp.where(base > 0.0, base_safe**exponent, 0.0)
    return diffuse, specular


def shade_soa(rec: SoAHit, view: V3, lights: Lights) -> V3:
    """Local Blinn-Phong color at each hit point (main.cpp:102-104)."""
    kd, ks, exp = rec.diffuse, rec.specular, rec.specular_exponent
    intensity = V3.fill(rec.t.shape, 0.0)

    for li in range(lights.point_position.shape[0]):
        lp = V3.from_stacked(lights.point_position[li])
        lc = V3.from_stacked(lights.point_color[li])
        ldir = (lp - rec.point).normalized(eps=1e-12)
        diff, spec = _light_terms(ldir, rec.normal, view, exp)
        intensity = intensity + lc * (diff * kd + spec * ks)

    for si in range(lights.sun_color.shape[0]):  # [0,3] = statically sunless
        sun_dir = V3.from_stacked(lights.sun_direction[si]).normalized()
        sun_col = V3.from_stacked(lights.sun_color[si])
        ones = jnp.ones_like(rec.t)
        sdir = V3(sun_dir.x * ones, sun_dir.y * ones, sun_dir.z * ones)
        sdiff, sspec = _light_terms(sdir, rec.normal, view, exp)
        intensity = intensity + sun_col * (sdiff * kd + sspec * ks)

    return rec.color * (intensity + rec.ambient)


# ---------------------------------------------------------------------------
# Bounce loop (reference: recursive_ray_tracing, main.cpp:89-119)
# ---------------------------------------------------------------------------


# The whole-trace megakernel (fold + record + shade + reflect per level in
# one Pallas pass) beats the fused-jnp pipeline at EVERY scene size once
# shading/reflection moved in-kernel (v5e, 1080p d3: 5.2 vs 7.8 ms on the
# 3-prim demo; 640x640 d10: 4.0 vs 8.6 ms; 34 vs 59+ ms at 1024 spheres) —
# the round-1 crossover (jnp faster below ~24 prims) predated the
# megakernel. Auto now picks Pallas for any non-empty scene on TPU.
_PALLAS_MIN_PRIMS = 1


def resolve_fold_fn(fold: str, prim_unroll: int, num_prims: int) -> Callable | None:
    """Map a fold selector to a fold_fn for ``closest_hit_soa``.

    ``"jnp"`` — the fused jnp fold; ``"pallas"`` — the Pallas megakernel
    (ops/pallas_fold.py); ``"auto"`` — Pallas on TPU backends for scenes
    with enough primitives to amortize the kernel boundary, jnp otherwise.
    """
    if fold == "auto":
        from raytracer_tpu.ops.pallas_fold import pallas_available

        fold = (
            "pallas"
            if pallas_available() and num_prims >= _PALLAS_MIN_PRIMS
            else "jnp"
        )
    if fold == "pallas":
        # Two-level shortlist fold: per-tile candidate chunk lists built in
        # XLA from slab-clipped reach boxes + dead-lane masking; the kernel
        # loops only over each tile's shortlist. Bit-compatible (culling is
        # conservative).
        from raytracer_tpu.ops.pallas_fold import fold_closest_pallas_shortlist

        return fold_closest_pallas_shortlist
    if fold == "pallas_flat":
        from raytracer_tpu.ops.pallas_fold import fold_closest_pallas

        return fold_closest_pallas
    if fold == "jnp":
        return None  # closest_hit_soa's built-in default
    raise ValueError(f"unknown fold backend: {fold!r}")


def _trace_fixed_xla(scene, o, d, ts, idxs, depth):
    """The XLA bounce loop at FIXED per-level selections (t, index).

    This is exactly ``trace_soa``'s pipeline with each level's closest hit
    pinned to the megakernel's winners — the function the whole-trace
    custom VJP differentiates as the megakernel's backward."""
    level = iter(range(depth + 1))

    def hit_fn(sc, oo, dd, active=None):
        k = next(level)
        return _mm_hit(sc, oo, dd, ts[k], idxs[k])

    return trace_soa(scene, o, d, depth=depth, closest_hit_fn=hit_fn)


# Backward engine for the whole-trace megakernel: "pallas" (default) runs
# the reverse sweep as one VMEM kernel per level at the forward's saved
# residuals — no forward replay; "xla" differentiates the fixed-selection
# XLA pipeline instead (the round-2 path, kept for A/B and fallback).
_BWD_ENGINE = os.environ.get("RT_BWD", "pallas")


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _pallas_trace(scene, o, d, depth):
    """Whole-trace megakernel forward with a megakernel backward.

    Forward: one Pallas kernel per level (fold + winner record + shading +
    sky + reflection, all in VMEM — ops/pallas_fold.py trace_levels_pallas).
    Backward: every fold is selection-only, so the gradient is that of the
    level math at fixed selections — computed by the backward trace kernels
    (trace_levels_pallas_bwd) from the forward's saved per-level rays /
    throughput / selections, with the parameter scatter riding the same
    one-hot-matmul transpose as `_mm_hit`."""
    from raytracer_tpu.ops.pallas_fold import trace_levels_pallas

    acc, _, _ = trace_levels_pallas(scene, o, d, depth=depth)
    return acc


def _pallas_trace_fwd(scene, o, d, depth):
    from raytracer_tpu.ops.pallas_fold import trace_levels_pallas

    if _BWD_ENGINE == "xla":
        acc, ts, idxs = trace_levels_pallas(scene, o, d, depth=depth)
        return acc, (scene, o, d, ts, idxs, None, None, None)
    acc, ts, idxs, rays_levels, w_levels, sl_levels = trace_levels_pallas(
        scene, o, d, depth=depth, with_residuals=True
    )
    return acc, (scene, o, d, ts, idxs, rays_levels, w_levels, sl_levels)


def _pallas_trace_bwd(depth, res, ct):
    scene, o, d, ts, idxs, rays_levels, w_levels, sl_levels = res
    if _BWD_ENGINE == "xla":
        _, vjp = jax.vjp(
            lambda sc, oo, dd: _trace_fixed_xla(sc, oo, dd, ts, idxs, depth),
            scene, o, d,
        )
        return vjp(ct)
    from raytracer_tpu.ops.pallas_fold import trace_levels_pallas_bwd

    scene_ct, ct_o, ct_d = trace_levels_pallas_bwd(
        scene, ts, idxs, rays_levels, w_levels, sl_levels, ct, depth=depth
    )
    # The trace consumed broadcasted rays; reduce cotangents back to the
    # inputs' shapes (mirrors jax's implicit broadcast transpose).
    def unbroadcast(c, like):
        if c.shape == like.shape:
            return c
        extra = c.ndim - like.ndim
        if extra:
            c = c.sum(axis=tuple(range(extra)))
        axes = tuple(
            i for i, (cs, ls) in enumerate(zip(c.shape, like.shape))
            if ls == 1 and cs != 1
        )
        if axes:
            c = c.sum(axis=axes, keepdims=True)
        return c.reshape(like.shape)

    ct_o = V3(*(unbroadcast(c, ref) for c, ref in zip(ct_o, o)))
    ct_d = V3(*(unbroadcast(c, ref) for c, ref in zip(ct_d, d)))
    return scene_ct, ct_o, ct_d


_pallas_trace.defvjp(_pallas_trace_fwd, _pallas_trace_bwd)


def trace_soa(
    scene: Scene,
    o: V3,
    d: V3,
    *,
    depth: int = 3,
    prim_unroll: int = 64,
    fold: str = "auto",
    closest_hit_fn: Callable[[Scene, V3, V3], SoAHit] | None = None,
) -> V3:
    """Radiance per ray (pre-tonemap), unrolling the reference recursion.

    Front-to-back expansion of ``C_k = lerp(local_k, C_{k+1}, m_k)``
    (main.cpp:117): carry throughput ``w``; each level adds
    ``w * (1-m) * local`` on hits (full ``local`` on the last level,
    main.cpp:105-108) or ``w * sky`` on misses, then reflects. Python-level
    unroll: static depth, one XLA fusion end to end.
    """
    import inspect

    if closest_hit_fn is None:
        in_smap = _inside_shard_map(d.x)
        fold_fn = (
            None if in_smap
            else resolve_fold_fn(fold, prim_unroll, scene.num_primitives)
        )
        if (
            getattr(fold_fn, "_emits_hit_record", False)
            and scene.num_primitives >= 1
            and _USE_CUSTOM_TAKE()
        ):
            # Whole-trace megakernel path: one Pallas kernel per level,
            # fixed-selection XLA backward (see _pallas_trace). Faster than
            # the fused-XLA pipeline at every scene size (see
            # _PALLAS_MIN_PRIMS note).
            return _pallas_trace(scene, o, d, depth)

        def closest_hit_fn(sc, oo, dd, active=None):
            return closest_hit_soa(
                sc, oo, dd, prim_unroll=prim_unroll, fold_fn=fold_fn,
                active=active,
            )

    try:
        accepts_active = "active" in inspect.signature(closest_hit_fn).parameters
    except (TypeError, ValueError):
        accepts_active = False

    shape = jnp.broadcast_shapes(o.x.shape, d.x.shape)
    o = V3(*[jnp.broadcast_to(c, shape) for c in o])
    w = jnp.ones(shape, jnp.float32)
    acc = V3.fill(shape, 0.0)
    active = None  # level 0: every lane carries throughput

    for k in range(depth + 1):
        if accepts_active:
            rec = closest_hit_fn(scene, o, d, active=active)
        else:
            rec = closest_hit_fn(scene, o, d)
        local = shade_soa(rec, -d, scene.lights)
        sky = background_soa(d, scene.sky)
        is_last = k == depth
        hit_color = local if is_last else local * (1.0 - rec.metallic)
        if active is None:
            contrib = V3.where(rec.hit, hit_color, sky)
        else:
            # Inactive lanes may carry arbitrary fold results (the shortlist
            # fold skips them); their w is exactly 0, but 0 * garbage must
            # still be a clean 0, so force their contribution to the sky.
            contrib = V3.where(rec.hit & active, hit_color, sky)
        acc = acc + contrib * w
        if not is_last:
            w = w * jnp.where(rec.hit, rec.metallic, 0.0)
            bounce_o = rec.point + rec.normal * _REFLECT_EPS
            o = V3.where(rec.hit, bounce_o, o)
            d = V3.where(rec.hit, d.reflect(rec.normal), d)
            active = jax.lax.stop_gradient(w > 0.0)
    return acc


def render_tile(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    *,
    row_offset=0,
    rows: int | None = None,
    depth: int = 3,
    prim_unroll: int = 64,
    fold: str = "auto",
    closest_hit_fn=None,
) -> V3:
    """Raygen + trace for a row tile; returns radiance V3 of ``[rows, W]``."""
    o, d = raygen_tile(camera, width, height, row_offset=row_offset, rows=rows)
    return trace_soa(
        scene, o, d, depth=depth, prim_unroll=prim_unroll, fold=fold,
        closest_hit_fn=closest_hit_fn,
    )
