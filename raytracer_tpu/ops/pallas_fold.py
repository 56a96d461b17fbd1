"""Pallas TPU megakernel for the closest-hit min-fold.

The rays/s-critical kernel (SURVEY.md §7 build plan step 3): a tile of rays
is pinned in VMEM while the kernel loops over every primitive, folding a
running (min-t, argmin-index) carry — the reference's ``find_closest_hit``
linear scan (main.cpp:67-84) restructured as (ray-tile x primitive-loop)
with zero HBM traffic per primitive.

Versus the fused-jnp fold, this removes the chunk-``lax.scan`` that round
-trips the [H, W] carry through HBM every ``prim_unroll`` primitives on
large scenes, and hoists the per-ray invariants (|o|^2, d.o) out of the
primitive loop:

    sphere test per primitive (scene.cpp:40-78, a = |d|^2 = 1):
      B = d.o - d.c          C = |o|^2 - 2 o.c + (|c|^2 - r^2)
      disc = B^2 - C         t = -B - sqrt(disc)
    accept iff disc >= 0 and t > 0 and t < best (strict '<': main.cpp:77)

The fold is selection-only (argmin), so it runs gradient-free — the
differentiable path re-evaluates the winner's t outside (ops/trace.py's
``_winner_t``); no custom VJP is needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.core.types import Scene
from raytracer_tpu.core.v3 import V3
from raytracer_tpu.ops.trace import MISS_T, _wall_tables

__all__ = ["fold_closest_pallas", "pallas_available"]

_LANES = 128
_TILE_ROWS = 256  # rays per tile = 256 x 128 = 32768; carries stay in VMEM
_UNROLL = 8


def pallas_available() -> bool:
    """Pallas TPU kernels need a TPU backend (tests use interpret mode)."""
    return jax.default_backend() not in ("cpu",)


def _kernel(n_s: int, n_w: int, n_b: int, wall_base: int, box_base: int):
    """Build the fold kernel for a (sphere-count, wall-count) configuration.

    ``n_s``/``n_w``/``n_b`` are the padded table sizes (multiples of _UNROLL;
    pad entries are guaranteed misses); ``wall_base``/``box_base`` are the
    REAL primitive-count offsets so winners carry the global indices
    ``gather_hit`` expects.
    """

    def kernel(
        # scalar-prefetch primitive tables (SMEM)
        cx, cy, cz, cr2,  # spheres: center xyz, |c|^2 - r^2          [n_s]
        nx, ny, nz, dpl, rx, ry, rz, ux, uy, uz, px, py, pz, ln, wd,  # walls
        bmnx, bmny, bmnz, bmxx, bmxy, bmxz,  # boxes: min/max corners
        # ray tile (VMEM)
        ox, oy, oz, dx, dy, dz,
        # outputs (VMEM)
        bt_ref, bi_ref,
    ):
        vox, voy, voz = ox[:], oy[:], oz[:]
        vdx, vdy, vdz = dx[:], dy[:], dz[:]
        oo = vox * vox + voy * voy + voz * voz  # per-ray invariants, hoisted
        do = vdx * vox + vdy * voy + vdz * voz

        best_t = jnp.full((_TILE_ROWS, _LANES), MISS_T, jnp.float32)
        best_i = jnp.full((_TILE_ROWS, _LANES), -1, jnp.int32)

        def sphere_one(n, carry):
            bt, bi = carry
            s = vdx * cx[n] + vdy * cy[n] + vdz * cz[n]  # d.c
            m = vox * cx[n] + voy * cy[n] + voz * cz[n]  # o.c
            b_half = do - s
            c_full = oo - 2.0 * m + cr2[n]
            disc = b_half * b_half - c_full
            t = -b_half - jnp.sqrt(jnp.maximum(disc, 0.0))
            win = (disc >= 0.0) & (t > 0.0) & (t < bt)
            return jnp.where(win, t, bt), jnp.where(win, n, bi)

        # Mosaic only supports unroll=1 fori_loops; unroll by hand over
        # _UNROLL-primitive chunks (tables are padded to a multiple).
        def sphere_chunk(k, carry):
            for u in range(_UNROLL):
                carry = sphere_one(k * _UNROLL + u, carry)
            return carry

        if n_s:
            best_t, best_i = jax.lax.fori_loop(
                0, n_s // _UNROLL, sphere_chunk, (best_t, best_i)
            )

        def wall_one(n, carry):
            bt, bi = carry
            denom = vdx * nx[n] + vdy * ny[n] + vdz * nz[n]
            num = dpl[n] - (vox * nx[n] + voy * ny[n] + voz * nz[n])
            ok = jnp.abs(denom) > 1e-12
            t = num / jnp.where(ok, denom, 1.0)
            relx = vox + vdx * t - px[n]
            rely = voy + vdy * t - py[n]
            relz = voz + vdz * t - pz[n]
            u = relx * rx[n] + rely * ry[n] + relz * rz[n]
            v = relx * ux[n] + rely * uy[n] + relz * uz[n]
            win = (
                ok
                & (t > 0.0)
                & (u >= 0.0)
                & (u <= ln[n])
                & (v >= 0.0)
                & (v <= wd[n])
                & (t < bt)
            )
            return jnp.where(win, t, bt), jnp.where(win, wall_base + n, bi)

        def wall_chunk(k, carry):
            for u in range(_UNROLL):
                carry = wall_one(k * _UNROLL + u, carry)
            return carry

        if n_w:
            best_t, best_i = jax.lax.fori_loop(
                0, n_w // _UNROLL, wall_chunk, (best_t, best_i)
            )

        if n_b:
            # Safe reciprocal direction, hoisted; sign-preserving fill keeps
            # it bit-compatible with ops/trace.py _safe_inv (sign(0)*BIG
            # would be 0, collapsing that slab axis for axis-parallel rays).
            def srecip(c):
                ok = jnp.abs(c) > 1e-12
                return jnp.where(
                    ok, 1.0 / jnp.where(ok, c, 1.0),
                    jnp.where(c >= 0.0, 1e30, -1e30),
                )

            ivx, ivy, ivz = srecip(vdx), srecip(vdy), srecip(vdz)

            def box_one(n, carry):
                bt, bi = carry
                t1x, t2x = (bmnx[n] - vox) * ivx, (bmxx[n] - vox) * ivx
                t1y, t2y = (bmny[n] - voy) * ivy, (bmxy[n] - voy) * ivy
                t1z, t2z = (bmnz[n] - voz) * ivz, (bmxz[n] - voz) * ivz
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                    jnp.minimum(t1z, t2z),
                )
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                    jnp.maximum(t1z, t2z),
                )
                win = (tn <= tf) & (tn > 0.0) & (tn < bt)
                return jnp.where(win, tn, bt), jnp.where(win, box_base + n, bi)

            def box_chunk(k, carry):
                for u in range(_UNROLL):
                    carry = box_one(k * _UNROLL + u, carry)
                return carry

            best_t, best_i = jax.lax.fori_loop(
                0, n_b // _UNROLL, box_chunk, (best_t, best_i)
            )

        bt_ref[:] = best_t
        bi_ref[:] = best_i

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_s", "n_w", "n_b", "wall_base", "box_base", "interpret"),
)
def _fold_flat(tables, rays, *, n_s: int, n_w: int, n_b: int, wall_base: int,
               box_base: int, interpret: bool):
    """Run the kernel over a flat padded ray batch ``[M, 128]`` x 6."""
    m = rays[0].shape[0]
    grid = m // _TILE_ROWS

    # index maps receive the scalar-prefetch refs after the grid indices
    ray_spec = pl.BlockSpec(
        (_TILE_ROWS, _LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (_TILE_ROWS, _LANES), lambda i, *_: (i, 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=25,
        grid=(grid,),
        in_specs=[ray_spec] * 6,
        out_specs=(out_spec, out_spec),
    )
    return pl.pallas_call(
        _kernel(n_s, n_w, n_b, wall_base, box_base),
        out_shape=(
            jax.ShapeDtypeStruct((m, _LANES), jnp.float32),
            jax.ShapeDtypeStruct((m, _LANES), jnp.int32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*tables, *rays)




def _packed_fold_tables(scene: Scene):
    """Scalar-prefetch primitive tables, padded to the manual unroll.

    Pad entries are guaranteed misses: spheres with |c|^2 - r^2 = +1e30 give
    disc < 0 for any real ray; walls with zero normal (denominator 0) and
    negative extents never pass the bounds test; degenerate boxes at +1e8
    reject on the slab ordering. Empty tables become one dead entry (the
    static loop bound is 0). Returns (tables, counts) where counts carries
    both real and padded primitive counts; padded counts are 0 when a
    family is absent.
    """
    s = scene.spheres
    cr2 = (
        s.center[:, 0] ** 2 + s.center[:, 1] ** 2 + s.center[:, 2] ** 2
        - s.radius * s.radius
    )
    w = _wall_tables(scene.walls)
    b = scene.boxes
    sphere_tables = (s.center[:, 0], s.center[:, 1], s.center[:, 2], cr2)
    wall_tables = (
        w["nx"], w["ny"], w["nz"], w["dplane"],
        w["rx"], w["ry"], w["rz"], w["ux"], w["uy"], w["uz"],
        w["px"], w["py"], w["pz"], w["length"], w["width"],
    )
    box_tables = (
        b.minimum[:, 0], b.minimum[:, 1], b.minimum[:, 2],
        b.maximum[:, 0], b.maximum[:, 1], b.maximum[:, 2],
    )

    def pad_table(t, size, fill):
        n = t.shape[0]
        if n == size:
            return t
        return jnp.concatenate([t, jnp.full((size - n,), fill, jnp.float32)])

    n_s, n_w, n_b = len(s), len(scene.walls), len(scene.boxes)
    n_s_pad = max(_UNROLL, -(-n_s // _UNROLL) * _UNROLL)
    n_w_pad = max(_UNROLL, -(-n_w // _UNROLL) * _UNROLL)
    n_b_pad = max(_UNROLL, -(-n_b // _UNROLL) * _UNROLL)
    tables = (
        tuple(
            pad_table(t, n_s_pad, 1e30 if i == 3 else 0.0)
            for i, t in enumerate(sphere_tables)
        )
        + tuple(
            pad_table(t, n_w_pad, -1.0 if i >= 13 else 0.0)
            for i, t in enumerate(wall_tables)
        )
        + tuple(pad_table(t, n_b_pad, 1e8) for t in box_tables)
    )
    counts = {
        "n_s": n_s, "n_w": n_w, "n_b": n_b,
        "n_s_pad": n_s_pad if n_s else 0,
        "n_w_pad": n_w_pad if n_w else 0,
        "n_b_pad": n_b_pad if n_b else 0,
    }
    return tables, counts


def fold_closest_pallas(
    scene: Scene, o: V3, d: V3, *, interpret: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(min-t, argmin index) for each ray — Pallas drop-in for the jnp fold.

    Accepts any-shaped ray tiles (components broadcastable to a common
    shape); flattens to [M, 128] tiles, pads the remainder with dead rays,
    and crops the result back.
    """
    shape = jnp.broadcast_shapes(o.x.shape, d.x.shape)
    p = 1
    for s in shape:
        p *= s
    tile = _TILE_ROWS * _LANES
    m_rows = -(-p // tile) * _TILE_ROWS
    pad = m_rows * _LANES - p

    def flat(c, fill):
        c = jnp.broadcast_to(c, shape).reshape(-1)
        if pad:
            c = jnp.concatenate([c, jnp.full((pad,), fill, c.dtype)])
        return c.reshape(m_rows, _LANES)

    rays = (
        flat(o.x, 0.0), flat(o.y, 0.0), flat(o.z, 0.0),
        flat(d.x, 0.0), flat(d.y, 0.0), flat(d.z, 1.0),
    )

    tables, counts = _packed_fold_tables(scene)

    bt, bi = _fold_flat(
        tables,
        rays,
        n_s=counts["n_s_pad"],
        n_w=counts["n_w_pad"],
        n_b=counts["n_b_pad"],
        wall_base=counts["n_s"],
        box_base=counts["n_s"] + counts["n_w"],
        interpret=interpret,
    )
    bt = bt.reshape(-1)[:p].reshape(shape)
    bi = bi.reshape(-1)[:p].reshape(shape)
    return bt, bi


# ---------------------------------------------------------------------------
# Tile-coherent culling fold: the TPU-native acceleration structure.
#
# BVHs are pointer-chasing and divergence — wrong for SIMD tiles. Instead,
# each kernel instance covers a *spatially coherent* 2-D pixel patch whose
# rays share tight origin/direction bounds; the kernel computes the patch's
# conservative reach box O + [0, T_far] * D by interval arithmetic and
# skips whole primitive chunks (lax.cond on a scalar) whose bounding boxes
# cannot intersect it. Primary-ray tiles cull most of the scene; incoherent
# bounce tiles degrade gracefully to the brute-force loop.
# ---------------------------------------------------------------------------

_TILE2_R, _TILE2_C = 128, 128  # pixel-patch block (sweep: 128x128 beat 64x128 and 128x384)


def _kernel2d(n_s: int, n_w: int, n_b: int, wall_base: int, box_base: int):
    """Culling variant of the fold kernel over 2-D pixel patches."""

    def kernel(
        cx, cy, cz, cr2,
        nx, ny, nz, dpl, rx, ry, rz, ux, uy, uz, px, py, pz, ln, wd,
        bmnx, bmny, bmnz, bmxx, bmxy, bmxz,
        tfar,  # [1] conservative max hit distance (scalar prefetch)
        ox, oy, oz, dx, dy, dz,
        bt_ref, bi_ref,
    ):
        vox, voy, voz = ox[:], oy[:], oz[:]
        vdx, vdy, vdz = dx[:], dy[:], dz[:]
        oo = vox * vox + voy * voy + voz * voz
        do = vdx * vox + vdy * voy + vdz * voz

        # Conservative reach box of this tile's rays: O + [0, T] * D.
        t_far = tfar[0]

        def reach(o_c, d_c):
            o_lo, o_hi = jnp.min(o_c), jnp.max(o_c)
            d_lo, d_hi = jnp.min(d_c), jnp.max(d_c)
            return (
                o_lo + t_far * jnp.minimum(d_lo, 0.0),
                o_hi + t_far * jnp.maximum(d_hi, 0.0),
            )

        rxlo, rxhi = reach(vox, vdx)
        rylo, ryhi = reach(voy, vdy)
        rzlo, rzhi = reach(voz, vdz)

        best_t = jnp.full((_TILE2_R, _TILE2_C), MISS_T, jnp.float32)
        best_i = jnp.full((_TILE2_R, _TILE2_C), -1, jnp.int32)

        def sphere_one(n, carry):
            bt, bi = carry
            s = vdx * cx[n] + vdy * cy[n] + vdz * cz[n]
            m = vox * cx[n] + voy * cy[n] + voz * cz[n]
            b_half = do - s
            c_full = oo - 2.0 * m + cr2[n]
            disc = b_half * b_half - c_full
            t = -b_half - jnp.sqrt(jnp.maximum(disc, 0.0))
            win = (disc >= 0.0) & (t > 0.0) & (t < bt)
            return jnp.where(win, t, bt), jnp.where(win, n, bi)

        def sphere_overlap(n):
            # radius^2 = |c|^2 - cr2 (cr2 = |c|^2 - r^2); pad entries have
            # cr2 = +1e30 -> r2 negative -> r = 0 -> overlap almost never.
            r2 = cx[n] * cx[n] + cy[n] * cy[n] + cz[n] * cz[n] - cr2[n]
            r = jnp.sqrt(jnp.maximum(r2, 0.0))
            return (
                (cx[n] - r <= rxhi) & (cx[n] + r >= rxlo)
                & (cy[n] - r <= ryhi) & (cy[n] + r >= rylo)
                & (cz[n] - r <= rzhi) & (cz[n] + r >= rzlo)
            )

        def sphere_chunk(k, carry):
            base = k * _UNROLL
            run = sphere_overlap(base)
            for u in range(1, _UNROLL):
                run = run | sphere_overlap(base + u)

            def do_chunk(c):
                for u in range(_UNROLL):
                    c = sphere_one(base + u, c)
                return c

            return jax.lax.cond(run, do_chunk, lambda c: c, carry)

        if n_s:
            best_t, best_i = jax.lax.fori_loop(
                0, n_s // _UNROLL, sphere_chunk, (best_t, best_i)
            )

        # Walls and boxes are few; reuse the brute-force loops.
        def wall_one(n, carry):
            bt, bi = carry
            denom = vdx * nx[n] + vdy * ny[n] + vdz * nz[n]
            num = dpl[n] - (vox * nx[n] + voy * ny[n] + voz * nz[n])
            ok = jnp.abs(denom) > 1e-12
            t = num / jnp.where(ok, denom, 1.0)
            relx = vox + vdx * t - px[n]
            rely = voy + vdy * t - py[n]
            relz = voz + vdz * t - pz[n]
            u = relx * rx[n] + rely * ry[n] + relz * rz[n]
            v = relx * ux[n] + rely * uy[n] + relz * uz[n]
            win = (
                ok & (t > 0.0)
                & (u >= 0.0) & (u <= ln[n])
                & (v >= 0.0) & (v <= wd[n])
                & (t < bt)
            )
            return jnp.where(win, t, bt), jnp.where(win, wall_base + n, bi)

        def wall_chunk(k, carry):
            for u in range(_UNROLL):
                carry = wall_one(k * _UNROLL + u, carry)
            return carry

        if n_w:
            best_t, best_i = jax.lax.fori_loop(
                0, n_w // _UNROLL, wall_chunk, (best_t, best_i)
            )

        if n_b:
            def srecip(c):
                ok = jnp.abs(c) > 1e-12
                return jnp.where(
                    ok, 1.0 / jnp.where(ok, c, 1.0),
                    jnp.where(c >= 0.0, 1e30, -1e30),
                )

            ivx, ivy, ivz = srecip(vdx), srecip(vdy), srecip(vdz)

            def box_one(n, carry):
                bt, bi = carry
                t1x, t2x = (bmnx[n] - vox) * ivx, (bmxx[n] - vox) * ivx
                t1y, t2y = (bmny[n] - voy) * ivy, (bmxy[n] - voy) * ivy
                t1z, t2z = (bmnz[n] - voz) * ivz, (bmxz[n] - voz) * ivz
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                    jnp.minimum(t1z, t2z),
                )
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                    jnp.maximum(t1z, t2z),
                )
                win = (tn <= tf) & (tn > 0.0) & (tn < bt)
                return jnp.where(win, tn, bt), jnp.where(win, box_base + n, bi)

            def box_chunk(k, carry):
                for u in range(_UNROLL):
                    carry = box_one(k * _UNROLL + u, carry)
                return carry

            best_t, best_i = jax.lax.fori_loop(
                0, n_b // _UNROLL, box_chunk, (best_t, best_i)
            )

        bt_ref[:] = best_t
        bi_ref[:] = best_i

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("n_s", "n_w", "n_b", "wall_base", "box_base", "interpret"),
)
def _fold_2d(tables, tfar, rays, *, n_s: int, n_w: int, n_b: int,
             wall_base: int, box_base: int, interpret: bool):
    """Run the culling kernel over padded [H, W] component arrays."""
    h, w = rays[0].shape
    grid = (h // _TILE2_R, w // _TILE2_C)
    spec = pl.BlockSpec(
        (_TILE2_R, _TILE2_C), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=26,
        grid=grid,
        in_specs=[spec] * 6,
        out_specs=(spec, spec),
    )
    return pl.pallas_call(
        _kernel2d(n_s, n_w, n_b, wall_base, box_base),
        out_shape=(
            jax.ShapeDtypeStruct((h, w), jnp.float32),
            jax.ShapeDtypeStruct((h, w), jnp.int32),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*tables, tfar, *rays)


def _scene_tfar(scene: Scene, o: V3) -> jnp.ndarray:
    """Conservative max hit distance: |o|_max + 2 * scene radius (origin-
    centric bound; any hit point lies within the scene's bounding sphere)."""
    parts = []
    s = scene.spheres
    if len(s):
        parts.append(
            jnp.max(jnp.linalg.norm(s.center, axis=-1) + s.radius)
        )
    w = scene.walls
    if len(w):
        ext = jnp.maximum(w.length, w.width) * 1.4142136
        parts.append(jnp.max(jnp.linalg.norm(w.position, axis=-1) + ext))
    b = scene.boxes
    if len(b):
        parts.append(
            jnp.maximum(
                jnp.max(jnp.linalg.norm(b.minimum, axis=-1)),
                jnp.max(jnp.linalg.norm(b.maximum, axis=-1)),
            )
        )
    radius = jnp.max(jnp.stack(parts)) if parts else jnp.float32(1.0)
    o_norm = jnp.sqrt(
        jnp.max(o.x * o.x + o.y * o.y + o.z * o.z)
    )
    return (o_norm + 2.0 * radius + 1.0).reshape(1)


def fold_closest_pallas_cull(
    scene: Scene, o: V3, d: V3, *, interpret: bool = False
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Tile-coherent culling fold over [H, W] ray components.

    Bit-compatible with ``fold_closest_pallas`` (culling is conservative);
    pads H/W up to tile multiples with dead rays and crops back.
    """
    shape = jnp.broadcast_shapes(o.x.shape, d.x.shape)
    h, w = shape
    hp = -(-h // _TILE2_R) * _TILE2_R
    wp = -(-w // _TILE2_C) * _TILE2_C

    def prep(c, fill):
        c = jnp.broadcast_to(c, shape)
        if hp != h or wp != w:
            c = jnp.pad(c, ((0, hp - h), (0, wp - w)), constant_values=fill)
        return c

    rays = (
        prep(o.x, 0.0), prep(o.y, 0.0), prep(o.z, 0.0),
        prep(d.x, 0.0), prep(d.y, 0.0), prep(d.z, 1.0),
    )
    tables, counts = _packed_fold_tables(scene)
    tfar = _scene_tfar(jax.tree_util.tree_map(jax.lax.stop_gradient, scene), o)
    bt, bi = _fold_2d(
        tables, tfar, rays,
        n_s=counts["n_s_pad"], n_w=counts["n_w_pad"], n_b=counts["n_b_pad"],
        wall_base=counts["n_s"], box_base=counts["n_s"] + counts["n_w"],
        interpret=interpret,
    )
    if hp != h or wp != w:
        bt, bi = bt[:h, :w], bi[:h, :w]
    return bt, bi
