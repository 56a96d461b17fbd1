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

import contextvars
import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.core.types import Scene
from raytracer_tpu.core.v3 import V3
from raytracer_tpu.ops.trace import MISS_T, _wall_tables

__all__ = [
    "fold_closest_pallas",
    "fold_closest_pallas_shortlist",
    "hit_closest_pallas_shortlist",
    "pallas_available",
]

_LANES = 128
_TILE_ROWS = 256  # rays per tile = 256 x 128 = 32768; carries stay in VMEM
# Spheres per chunk / manual inner unroll (Mosaic fori_loop has no unroll
# support). Scene-size-adaptive: honest process-per-config sweep
# (2026-08-19, grid-1024 1080p d3, v5e): 16 -> 60.4 ms, 32 -> 58.3, 64 ->
# 69.6; but 32 costs the 3-prim demo +1 ms/frame (a 32-wide chunk is 31
# pad entries there), so small scenes keep 16. The active value is set per
# trace by `_use_unroll` (entry points), keyed on the sphere count, and
# carried in a ContextVar — NOT a module global — so concurrent traces
# (threads, nested builds of different scenes) can never observe each
# other's chunk size (VERDICT r4 weak item 3). Every jitted entry that
# reads the config takes it as an explicit static `cfg` arg (via
# `_jit_cfg`) so jit caches key on it (two scenes with identical padded
# table shapes but different chunk sizes compile separately).
# RT_FOLD_UNROLL overrides for process-per-config sweeps.
_UNROLL_LARGE_MIN_SPHERES = 256


def _resolve_unroll(n_s: int) -> int:
    env = os.environ.get("RT_FOLD_UNROLL")
    if env:
        return int(env)
    if 0 < n_s <= 16:
        # Single-chunk scenes fold EXACTLY their spheres: a 3-prim demo
        # level was paying 16 sphere tests (15 guaranteed-miss pads) per
        # ray — and the winner regather another 16 masked-select sweeps.
        return n_s
    return 32 if n_s >= _UNROLL_LARGE_MIN_SPHERES else 16


def _resolve_gate_geom(n_s: int, unroll: int) -> str:
    """Chunk-gate geometry for this scene size (see `_gate_geom()`).

    "auto": AABB slab gates for multi-chunk scenes (32 spread spheres make
    the circumscribing+member-reach bounding sphere much looser than the
    box: grid-1024 1080p d3 51.8 -> 48.9 ms, grid-64 9.4 -> 7.8, c5 4K
    227.9 -> 208.8, v5e 2026-08-20); bounding spheres for single-chunk
    scenes (a lone sphere's bounding sphere IS the sphere — the box is the
    loose one: c3 3.3 -> 4.3 ms under aabb). Deterministic in the jitted
    static args (sphere count, unroll), so jit caches stay consistent."""
    env = os.environ.get("RT_GATE_GEOM", "auto")
    if env != "auto":
        return env
    n_chunks = -(-n_s // unroll) if n_s else 0
    return "aabb" if n_chunks >= 2 else "sphere"


# The active (chunk size, gate geometry) for the current trace build.
# ContextVar, not a module global: per-thread / per-context, so two
# interleaved builds of different scenes each see their own value
# (tests/test_pallas_fold.py::test_interleaved_scene_builds).
_fold_cfg = contextvars.ContextVar("rt_fold_cfg", default=(16, "aabb"))


def _unroll() -> int:
    """Spheres per fold chunk for the build in progress."""
    return _fold_cfg.get()[0]


def _gate_geom() -> str:
    """Chunk-gate geometry ("aabb"|"sphere") for the build in progress."""
    return _fold_cfg.get()[1]


def _cfg_key() -> tuple:
    """The hashable (unroll, gate_geom) pair jitted entries key on."""
    return _fold_cfg.get()


class _use_unroll:
    """Set the active chunk size + gate geometry for one trace build."""

    def __init__(self, n_spheres: int):
        n = _resolve_unroll(n_spheres)
        self._cfg = (n, _resolve_gate_geom(n_spheres, n))

    def __enter__(self):
        self._tok = _fold_cfg.set(self._cfg)

    def __exit__(self, *a):
        _fold_cfg.reset(self._tok)


def _jit_cfg(**jit_kwargs):
    """`jax.jit` whose cache keys on the fold config.

    Wraps the function so it REQUIRES a static ``cfg=(unroll, gate_geom)``
    kwarg (pass ``cfg=_cfg_key()``) and traces its body under that config —
    the body and every helper it calls read the ContextVar, so the traced
    program always matches the cfg in the jit cache key. Without this, two
    scenes whose padded table shapes coincide but whose chunk sizes differ
    would silently share one compiled executable (the CLAUDE.md "jit caches
    don't key on module constants" trap, previously only avoidable with
    process-per-config sweeps)."""
    names = tuple(jit_kwargs.pop("static_argnames"))

    def deco(f):
        # NOT functools.wraps: jax.jit resolves argnames through
        # __wrapped__, which would hide the added `cfg` kwarg.
        def with_cfg(*args, cfg, **kwargs):
            tok = _fold_cfg.set(cfg)
            try:
                return f(*args, **kwargs)
            finally:
                _fold_cfg.reset(tok)

        def set_meta(f):
            with_cfg.__name__ = f.__name__ + "_cfg"
            with_cfg.__qualname__ = f.__qualname__ + "_cfg"

        set_meta(f)
        return jax.jit(
            with_cfg, static_argnames=(*names, "cfg"), **jit_kwargs
        )

    return deco


def pallas_available() -> bool:
    """Pallas TPU kernels need a TPU backend (tests use interpret mode)."""
    return jax.default_backend() not in ("cpu",)


def _out_struct(shape, dtype, ref):
    """ShapeDtypeStruct carrying the input's varying-mesh-axes (vma) set.

    Under `jax.shard_map` (check_vma=True) pallas_call outputs must declare
    how they vary across mesh axes; outside shard_map the attribute is
    absent/empty and must not be passed."""
    vma = getattr(jax.typeof(ref), "vma", None)
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


def _kernel(n_s: int, n_w: int, n_b: int, wall_base: int, box_base: int):
    """Build the fold kernel for a (sphere-count, wall-count) configuration.

    ``n_s``/``n_w``/``n_b`` are the padded table sizes (multiples of _unroll();
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
            # Miss lanes (disc < 0) make t NaN and every IEEE compare
            # below false — same selections as the explicit disc >= 0
            # guard, 3 fewer VPU ops per (ray, sphere) test. Selection
            # -only (stop-gradient) so the NaN never meets a derivative;
            # bit-compat asserted vs the jnp fold by tests.
            t = -b_half - jnp.sqrt(disc)
            win = (t > 0.0) & (t < bt)
            return jnp.where(win, t, bt), jnp.where(win, n, bi)

        # Mosaic only supports unroll=1 fori_loops; unroll by hand over
        # _unroll()-primitive chunks (tables are padded to a multiple).
        def sphere_chunk(k, carry):
            for u in range(_unroll()):
                carry = sphere_one(k * _unroll() + u, carry)
            return carry

        if n_s:
            best_t, best_i = jax.lax.fori_loop(
                0, n_s // _unroll(), sphere_chunk, (best_t, best_i)
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

        # Full chunks run under a fori loop; the remainder (the whole
        # count, for few-wall scenes) unrolls exactly — no padded tests.
        if n_w:
            n_w_full = (n_w // _unroll()) * _unroll()

            def wall_chunk(k, carry):
                for u in range(_unroll()):
                    carry = wall_one(k * _unroll() + u, carry)
                return carry

            if n_w_full:
                best_t, best_i = jax.lax.fori_loop(
                    0, n_w_full // _unroll(), wall_chunk, (best_t, best_i)
                )
            for i in range(n_w_full, n_w):
                best_t, best_i = wall_one(i, (best_t, best_i))

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

            n_b_full = (n_b // _unroll()) * _unroll()

            def box_chunk(k, carry):
                for u in range(_unroll()):
                    carry = box_one(k * _unroll() + u, carry)
                return carry

            if n_b_full:
                best_t, best_i = jax.lax.fori_loop(
                    0, n_b_full // _unroll(), box_chunk, (best_t, best_i)
                )
            for i in range(n_b_full, n_b):
                best_t, best_i = box_one(i, (best_t, best_i))

        bt_ref[:] = best_t
        bi_ref[:] = best_i

    return kernel


@_jit_cfg(static_argnames=("n_s", "n_w", "n_b", "wall_base", "box_base", "interpret"))
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
            _out_struct((m, _LANES), jnp.float32, rays[0]),
            _out_struct((m, _LANES), jnp.int32, rays[0]),
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
    n_s_pad = max(_unroll(), -(-n_s // _unroll()) * _unroll())
    n_w_pad = max(_unroll(), -(-n_w // _unroll()) * _unroll())
    n_b_pad = max(_unroll(), -(-n_b // _unroll()) * _unroll())
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


def _fold_closest_pallas_impl(
    scene: Scene, o: V3, d: V3, *, interpret: bool | None = None
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(min-t, argmin index) for each ray — Pallas drop-in for the jnp fold.

    Accepts any-shaped ray tiles (components broadcastable to a common
    shape); flattens to [M, 128] tiles, pads the remainder with dead rays,
    and crops the result back.
    """
    if interpret is None:
        interpret = not pallas_available()
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
        n_w=counts["n_w"],
        n_b=counts["n_b"],
        wall_base=counts["n_s"],
        box_base=counts["n_s"] + counts["n_w"],
        interpret=interpret,
        cfg=_cfg_key(),
    )
    bt = bt.reshape(-1)[:p].reshape(shape)
    bi = bi.reshape(-1)[:p].reshape(shape)
    return bt, bi


# ---------------------------------------------------------------------------
# Shortlist fold: the TPU-native two-level acceleration structure.
#
# The reach-box cull above tests every chunk inside the kernel with a global
# t_far — loose (measured: only 2.1x over brute force at 1024 spheres,
# 1080p primary rays). This fold moves candidate selection OUT of the kernel
# into vectorized XLA (phase A) and hands the kernel a compacted per-tile
# chunk shortlist (phase B), with two structural upgrades:
#
# * **Slab clipping**: every ray is clipped against the AABB of the sphere
#   set (for grid/logo scenes a thin slab). Any sphere hit point must lie on
#   the clipped segment, so the tile's reach box is the union of SHORT
#   segments instead of O + [0, t_far_global] * D. Primary tiles cull to
#   their frustum-through-the-slab footprint; divergent bounce rays become
#   short clipped segments; sky-bound rays contribute nothing at all.
# * **Dead-lane masking**: the bounce loop passes ``active = (throughput >
#   0)``; absorbed/missed lanes drop out of the reach stats, and fully dead
#   tiles skip every primitive (counts[t] = -1 gates walls/boxes too).
# * **Best-t-aware per-ray tube gate** (phase B): the tile-union shortlist
#   is hostage to its most divergent ray, so bounce tiles shortlist most of
#   the scene. Before folding each shortlisted chunk, the kernel tests every
#   ray's clipped segment [t0, min(t_ex, best_t)] against the chunk's
#   bounding sphere (~12% of the chunk-fold cost) and lax.cond-skips chunks
#   no alive ray can reach. best_t tightens as the fold proceeds, and phase
#   A orders each tile's shortlist near-to-far, so this is a SIMD
#   closest-hit traversal with early chunk rejection — no pointer chasing,
#   no divergence.
#
# Correctness: both phases only ever *discard* chunks that (inflated by an
# f32-rounding margin) cannot produce an improving hit for any alive ray,
# and the sphere fold tie-breaks on the global index, so the fold stays
# bit-compatible with the brute-force kernels regardless of traversal
# order — asserted by tests/test_pallas_fold.py on randomized scenes, rays,
# and masks.
# ---------------------------------------------------------------------------

_SL_R = int(os.environ.get("RT_SL_R", "64"))  # PRIMARY-ray shortlist tile
_SL_C = 128             # rows x 128 lanes (sweep on v5e: 64x128 beat
                        # 32/128-row and 256-lane tiles; RT_SL_R is the
                        # process-per-config sweep override)
# Bounce-ray tile rows: bounce rays diverge, so finer tiles tighten their
# union reach boxes (better chunk shortlists + tube gates) at the cost of
# per-level `_ray_stats` re-tiling (the free prev-kernel stats path needs
# sl_rb == sl_r) and more grid steps. Honest process-per-config sweep
# (2026-08-19, sanitized chains, v5e): grid-1024 1080p d3 16 -> 61.9 ms,
# 32 -> 53.5, 64 -> 58.5, 128 -> 63.9; demo 1080p d3 32 -> 3.98 ms vs
# 64 -> 4.21; c5 4K d4 32 -> 233.3 vs 64 -> 262.7. 32 wins everywhere
# (matching RT_SL_R=32 for the free-stats path is NOT better: grid-1024
# 53.1 ~ tie, demo 4.22 — the finer level-0 tile costs the primary pass
# more than the stats hand-off saves).
_SL_R_BOUNCE = int(os.environ.get("RT_SL_R_BOUNCE", "32"))
# Scenes with at least this many chunks run level 0 at the BOUNCE tile
# height too (one tiling for the whole trace -> the trace kernels' free
# in-VMEM stats hand-off replaces per-level _ray_stats; see the
# trace-impl comment). Well above _FUSED_MAX_CHUNKS so the fused/demo
# class keeps its measured-best 64-row tiles.
_SL_R_MATCH_MIN_CHUNKS = int(os.environ.get("RT_SL_R_MATCH_MIN_CHUNKS", "8"))
_AABB_PAD = 1e-3  # conservative inflation absorbing f32 rounding drift
_GATE_PAD = 1e-2  # bounding-sphere inflation for the in-kernel tube gate
_PHASE_A_BOUNCE = os.environ.get("RT_PHASE_A_BOUNCE", "1") != "0"
# per-tile shortlists for bounce rays (False = identity lists + in-kernel
# gates only; A/B knob)
# Shortlist granularity INSIDE a tile: the (sl_r, 128) ray tile is split
# into _SLICES row slices, each with its OWN phase-A chunk shortlist.
# Honest process-per-config sweep (2026-08-19, grid-1024 1080p d3, v5e,
# 3 chains each): 1 -> 60.4 ms, 2 -> 76.4, 4 -> 107.4, 8 -> 164.0.
# Per-slice shortlists are a pure LOSS at every granularity — the
# per-slice traversal loops multiply scalar control flow and phase-A sort
# work faster than tighter slice reach boxes cull chunks (the round-2
# "divergent bounce rays" rationale was committed unbenchmarked and caused
# the BENCH_r02 164 ms regression). Default 1 = one whole-tile shortlist
# per (sl_r, 128) tile. Env-overridable for sweeps only (jit caches don't
# key on module constants; sweep process-per-config); must divide the
# row-tile heights and be <= 8 (the stats block has 8 rows).
_SLICES = int(os.environ.get("RT_SLICES", "1"))
assert _SLICES in (1, 2, 4, 8), f"RT_SLICES must be 1/2/4/8, got {_SLICES}"
# Per-chunk best-t tube gate + lax.cond skip (A/B knob: the cond's scalar
# control flow stalls the Mosaic vector pipeline; 0 folds every shortlisted
# chunk unconditionally).
_TUBE_GATE = os.environ.get("RT_TUBE_GATE", "1") != "0"
# Tube-ACCEPTED shortlists: phase A intersects the AABB-overlap accept set
# with the stats kernel's per-chunk tube-reach union, so the fold loop
# never iterates a chunk no lane can reach (A/B knob; requires n_chunks <=
# _chunk_reach_capacity(), else silently falls back to AABB-only).
_TUBE_SHORTLIST = os.environ.get("RT_TUBE_SHORTLIST", "1") != "0"
# Sub-chunk best-t tube gates INSIDE accepted chunks: gate each accepted
# chunk's 8/16-sphere sub-blocks against their own (tighter) bounding
# spheres and cond-skip the ones no lane reaches. Measured a LOSS on the
# v5e (grid-1024 1080p d3, 2026-08-20, process-per-config: off 52.9 ms,
# _SUB=8 60.1, _SUB=16 56.8; demo unchanged) — divergent bounce tiles
# reach most sub-blocks of any chunk they reach at all, so the extra
# gates+conds outcost the skipped folds. Default OFF; kept as an A/B knob
# for sparser scene classes.
_SUB_GATE = os.environ.get("RT_SUB_GATE", "0") != "0"
_SUB = int(os.environ.get("RT_SUB", "8"))  # sub-chunk gate granularity (spheres)
# Per-row-group gated folds (A/B knob; see the block in
# _shortlist_fold_core). Measured a LOSS on grid-1024 1080p d3 (52.9 ->
# 67.7 ms, v5e 2026-08-20): 4x the cond/gate machinery swamps whatever
# group-level chunk skips exist. Fifth and final structural attempt at
# the per-lane/tile fold gap (sub-chunk gates, finer tiles, finer
# chunks, patch-major regrouping, row groups) — every granularity
# refinement of the (4096-ray, 32-sphere) fold unit loses on this
# hardware; the tile-level shortlists + tube gates already sit at the
# VPU's preferred op shape.
_GROUP_FOLD = os.environ.get("RT_GROUP_FOLD", "0") != "0"
_GROUP_ROWS = int(os.environ.get("RT_GROUP_ROWS", "8"))
# In-kernel chunk-gate geometry: "aabb" tests each ray's live segment
# [t0, min(t_ex, best_t)] against the chunk's (padded) AABB via the slab
# test; "sphere" uses the chunk bounding sphere (the original gate). The
# bounding sphere circumscribes the AABB *plus* member reach, so it admits
# diagonal near-misses the box rejects — traversal-simulated executed-fold
# counts on grid-1024 1080p d3 (2026-08-20, captured level states, faithful
# phase A + progressive any-lane gate): levels 1/2/3 sphere-gate
# 5065/7549/7577 folds -> aabb-gate 4244/5962/6075 (-16/-21/-20%).
# Bit-exact either way: both gates only skip chunks no live segment can
# touch (inflated by the same pads phase A uses). The ACTIVE value is set
# per scene by `_use_unroll` via `_resolve_gate_geom` (RT_GATE_GEOM env:
# auto | aabb | sphere) and read via `_gate_geom()` (ContextVar — see the
# `_fold_cfg` block at the top of the file).
# Row-sorted bounce traversal: at bounce levels of the per-level path,
# re-layout the frame into ROWS of 128 horizontally adjacent pixels
# ([hp, wp] -> [hp * wp/128, 128], a pure reshape) and re-SORT the rows
# between levels by a value key — (previous-level winner chunk, reflected
# -direction bin), dead rows last — so each kernel tile groups rays that
# need the SAME chunks instead of rays that happen to share a 32x128-pixel
# strip. The fold is traversal-order independent and the shortlists are
# conservative, so any row permutation is bit-exact; sorting only tightens
# each tile's reach union / tube gates. Offline reach analysis (grid-1024
# 1080p d3, 2026-08-20, tube sets clipped by each ray's final best_t):
# spatial tiles fold 9.8k/11.3k/11.3k chunk-tiles at levels 1/2/3; rows
# sorted by (chunk, ang8) fold 6.3k/8.2k/8.1k at 32-row tiles and
# 5.3k/6.4k/6.4k cost-units at 8-row tiles (the per-row union bound is
# ~4.3k). Row permutation is ~free on this backend (contiguous 512-byte
# segment gathers; measured at the dispatch floor), unlike per-ray
# gathers (16 ms/plane at 1080p — CLAUDE.md).
#
# MEASURED A LOSS (v5e, 2026-08-20, process-per-config): grid-1024 1080p
# d3 52.4 -> 55.8 ms (32-row sorted tiles; +1.6 ms slower kernels + 2.7 ms
# sort/permute glue), 92.7 ms at 8-row tiles. Traversal simulation on the
# captured level states explains it: the kernel's PROGRESSIVE any-lane
# best-t gate already executes only ~10-15 folds/tile (below the final-t
# union bound the offline analysis scored groupings by), and sorted tiles
# execute MORE (L1 5065 -> 5523): each 128-lane row carries minority lanes
# that hit OTHER chunks, and grouping rows by majority key mixes
# UNCORRELATED minorities from across the image — spatial neighbors'
# minorities at least correlate. Beating the union gate needs per-lane
# regrouping, and 128-lane rows are this hardware's minimum relayout unit
# (per-ray XLA gathers cost 16 ms/plane). Default OFF; kept as the
# documented sixth (and final) structural attempt at the per-lane/tile
# fold gap.
_ROW_SORT = os.environ.get("RT_ROW_SORT", "0") != "0"
_ROW_SORT_MIN_CHUNKS = int(os.environ.get("RT_ROW_SORT_MIN_CHUNKS", "8"))
_SORT_R = int(os.environ.get("RT_SORT_R", "32"))  # sorted-tile row height
_SORT_DIR_BINS = int(os.environ.get("RT_SORT_DIR_BINS", "8"))
# Patch-major bounce layout (A/B knob): re-layout bounce-level rays so one
# (8, 128) block = one 32x32-PIXEL patch and one (32, 128) kernel tile = 4
# Morton-adjacent patches (a ~64x64-pixel square) instead of a 32x128-pixel
# strip. Squarer tiles see a narrower reflected-direction fan, so their
# reach unions/shortlists tighten. Pure bijection (two static transposes +
# a constant-index patch permutation per frame) — bit-exact.
_PATCH_MAJOR = os.environ.get("RT_PATCH_MAJOR", "0") != "0"
_PATCH = 32  # patch side (pixels); 32*32 = 8*128 = one f32 VMEM block


def _check_sl_r(sl_r: int) -> int:
    """Row-tile heights must split evenly into _SLICES row slices."""
    if sl_r % _SLICES != 0:
        raise ValueError(
            f"row tile height {sl_r} is not a multiple of _SLICES={_SLICES} "
            "(RT_SLICES / RT_SL_R_BOUNCE are inconsistent)"
        )
    return sl_r


def _srecip(c):
    """Sign-preserving safe reciprocal (bit-compatible with trace._safe_inv)."""
    ok = jnp.abs(c) > 1e-12
    return jnp.where(
        ok, 1.0 / jnp.where(ok, c, 1.0),
        jnp.where(c >= 0.0, 1e30, -1e30),
    )


def _shortlist_fold_core(
    sm: dict, t: jnp.ndarray,
    vox, voy, voz, vdx, vdy, vdz, oo, do, amask,
    n_w: int, n_b: int, wall_base: int, box_base: int, n_chunks: int,
    counts_val=None,
):
    """The shortlist fold: (best_t, best_i, t0, t_ex, seg_ok, alive).

    Shared by the (t, index) kernel and the full-hit-record kernel. ``sm``
    holds the scalar-prefetch refs by name. The sphere traversal runs per
    (rows/_SLICES, 128) row SLICE, each over its OWN phase-A shortlist
    (``counts[t*_SLICES + s]`` entries at ``chunk_list[(t*_SLICES + s) *
    n_chunks ...]``); each shortlisted chunk is additionally gated by a
    best-t-aware per-slice tube test against the chunk's bounding sphere
    before its fold runs. The sphere fold tie-breaks on the global index so
    the result is independent of the (near-to-far sorted) traversal order.
    """
    cx, cy, cz, cr2 = sm["cx"], sm["cy"], sm["cz"], sm["cr2"]
    chunk_list, counts, slab = sm["chunk_list"], sm["counts"], sm["slab"]
    gx, gy, gz, gg, gr2 = sm["gx"], sm["gy"], sm["gz"], sm["gg"], sm["gr2"]
    sgx, sgy, sgz = sm["sgx"], sm["sgy"], sm["sgz"]
    sgg, sgr2 = sm["sgg"], sm["sgr2"]
    n_sub = _unroll() // _SUB if _unroll() > _SUB else 1
    # counts_val (traced i32): in-kernel override for fused whole-trace
    # calls — the shortlist is the identity (chunk k = k) and liveness is
    # computed from the level's in-VMEM throughput, not phase A.
    if counts_val is not None:
        alive = counts_val >= 0
    else:
        alive = counts[t * _SLICES] >= 0
        for s_i in range(1, _SLICES):
            alive = alive | (counts[t * _SLICES + s_i] >= 0)
    rows, cols = vox.shape

    # Per-ray slab clip (same intervals as phase A): any sphere hit lies
    # on [t0, t_ex]. Lanes that miss the slab or are masked dead can
    # never improve on any chunk — they drop out of the gate entirely.
    def axis_iv(o_c, d_c, lo_c, hi_c):
        inv = _srecip(d_c)
        t1, t2 = (lo_c - o_c) * inv, (hi_c - o_c) * inv
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    ex_lo, ex_hi = axis_iv(vox, vdx, slab[0], slab[3])
    ey_lo, ey_hi = axis_iv(voy, vdy, slab[1], slab[4])
    ez_lo, ez_hi = axis_iv(voz, vdz, slab[2], slab[5])
    t0 = jnp.maximum(jnp.maximum(jnp.maximum(ex_lo, ey_lo), ez_lo), 0.0)
    t_ex = jnp.minimum(jnp.minimum(ex_hi, ey_hi), ez_hi)
    seg_ok = (amask > 0.0) & (t_ex >= t0) & (t_ex > 0.0)

    best_t = jnp.full((rows, cols), MISS_T, jnp.float32)
    best_i = jnp.full((rows, cols), -1, jnp.int32)

    # Walls and boxes fold FIRST: they are few and cheap, and the best_t
    # they establish (e.g. the floor under a sphere grid) lets the tube
    # gate reject every sphere chunk beyond them before its fold runs.
    # Outcome-identical to the old spheres-first order: walls/boxes win
    # only on strict '<', spheres win exact ties via the (idx < bi)
    # tie-break, and sphere indices sort below wall/box indices globally.
    if n_w:
        nx, ny, nz, dpl = sm["nx"], sm["ny"], sm["nz"], sm["dpl"]
        rx, ry, rz = sm["rx"], sm["ry"], sm["rz"]
        ux, uy, uz = sm["ux"], sm["uy"], sm["uz"]
        px, py, pz, ln, wd = sm["px"], sm["py"], sm["pz"], sm["ln"], sm["wd"]

        def wall_one(i, carry, gate=None):
            bt, bi = carry
            denom = vdx * nx[i] + vdy * ny[i] + vdz * nz[i]
            num = dpl[i] - (vox * nx[i] + voy * ny[i] + voz * nz[i])
            ok = jnp.abs(denom) > 1e-12
            tt = num / jnp.where(ok, denom, 1.0)
            relx = vox + vdx * tt - px[i]
            rely = voy + vdy * tt - py[i]
            relz = voz + vdz * tt - pz[i]
            u = relx * rx[i] + rely * ry[i] + relz * rz[i]
            v = relx * ux[i] + rely * uy[i] + relz * uz[i]
            win = (
                ok & (tt > 0.0)
                & (u >= 0.0) & (u <= ln[i])
                & (v >= 0.0) & (v <= wd[i])
                & (tt < bt)
            )
            if gate is not None:
                win = win & gate
            return jnp.where(win, tt, bt), jnp.where(win, wall_base + i, bi)

        # Full chunks under an alive-gated fori; the remainder (the whole
        # count for few-wall scenes — the common case) unrolls exactly.
        n_w_full = (n_w // _unroll()) * _unroll()

        def wall_chunk(k, carry):
            for u in range(_unroll()):
                carry = wall_one(k * _unroll() + u, carry)
            return carry

        if n_w_full:
            best_t, best_i = jax.lax.fori_loop(
                0, jnp.where(alive, n_w_full // _unroll(), 0), wall_chunk,
                (best_t, best_i),
            )
        for i in range(n_w_full, n_w):
            # Tile-alive gate replicates the chunked loop's 0-trip skip:
            # dead tiles keep the miss sentinel (contract pinned by tests).
            best_t, best_i = wall_one(i, (best_t, best_i), gate=alive)

    if n_b:
        bmnx, bmny, bmnz = sm["bmnx"], sm["bmny"], sm["bmnz"]
        bmxx, bmxy, bmxz = sm["bmxx"], sm["bmxy"], sm["bmxz"]
        ivx, ivy, ivz = _srecip(vdx), _srecip(vdy), _srecip(vdz)

        def box_one(i, carry, gate=None):
            bt, bi = carry
            t1x, t2x = (bmnx[i] - vox) * ivx, (bmxx[i] - vox) * ivx
            t1y, t2y = (bmny[i] - voy) * ivy, (bmxy[i] - voy) * ivy
            t1z, t2z = (bmnz[i] - voz) * ivz, (bmxz[i] - voz) * ivz
            tn = jnp.maximum(
                jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                jnp.minimum(t1z, t2z),
            )
            tf = jnp.minimum(
                jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                jnp.maximum(t1z, t2z),
            )
            win = (tn <= tf) & (tn > 0.0) & (tn < bt)
            if gate is not None:
                win = win & gate
            return jnp.where(win, tn, bt), jnp.where(win, box_base + i, bi)

        n_b_full = (n_b // _unroll()) * _unroll()

        def box_chunk(k, carry):
            for u in range(_unroll()):
                carry = box_one(k * _unroll() + u, carry)
            return carry

        if n_b_full:
            best_t, best_i = jax.lax.fori_loop(
                0, jnp.where(alive, n_b_full // _unroll(), 0), box_chunk,
                (best_t, best_i),
            )
        for i in range(n_b_full, n_b):
            best_t, best_i = box_one(i, (best_t, best_i), gate=alive)

    # RT_GROUP_FOLD (A/B): ONE tile-level shortlist, but the fold of each
    # listed chunk runs per (8, 128) row GROUP with its own best-t tube
    # gate + cond — rows of a divergent bounce tile fan vertically, so a
    # group can skip chunks only other rows reach. Unlike the _SLICES
    # experiment (a measured loss), phase A is untouched: no extra lists,
    # no extra sorts, one fori loop.
    if (
        _GROUP_FOLD and _TUBE_GATE and _SLICES == 1
        and rows % _GROUP_ROWS == 0 and rows > _GROUP_ROWS
    ):
        n_g = counts_val if counts_val is not None else counts[t]
        list_base = t * n_chunks
        n_grp = rows // _GROUP_ROWS

        def mk_fold(q):
            slq = slice(q * _GROUP_ROWS, (q + 1) * _GROUP_ROWS)
            oxq, oyq, ozq = vox[slq], voy[slq], voz[slq]
            dxq, dyq, dzq = vdx[slq], vdy[slq], vdz[slq]
            ooq, doq = oo[slq], do[slq]
            t0q, texq, okq = t0[slq], t_ex[slq], seg_ok[slq]

            def sphere_one(idx, carry):
                bt, bi = carry
                s = dxq * cx[idx] + dyq * cy[idx] + dzq * cz[idx]
                m = oxq * cx[idx] + oyq * cy[idx] + ozq * cz[idx]
                b_half = doq - s
                c_full = ooq - 2.0 * m + cr2[idx]
                disc = b_half * b_half - c_full
                # NaN-compare miss rejection (see _kernel's sphere_one).
                tt = -b_half - jnp.sqrt(disc)
                win = (tt > 0.0) & (
                    (tt < bt) | ((tt == bt) & (idx < bi))
                )
                return jnp.where(win, tt, bt), jnp.where(win, idx, bi)

            def reach(c, bt_c):
                s_g = dxq * gx[c] + dyq * gy[c] + dzq * gz[c]
                m_g = oxq * gx[c] + oyq * gy[c] + ozq * gz[c]
                t1 = jnp.minimum(texq, bt_c)
                tc = jnp.clip(s_g - doq, t0q, t1)
                dist2 = (
                    ooq - 2.0 * m_g + gg[c] + tc * (2.0 * (doq - s_g) + tc)
                )
                return okq & (t1 >= t0q) & (dist2 <= gr2[c])

            def fold_chunk(base, cr):
                for u in range(_unroll()):
                    cr = sphere_one(base + u, cr)
                return cr

            return reach, fold_chunk

        grp_ops = [mk_fold(q) for q in range(n_grp)]

        def chunk_body(k, carry):
            c = k if counts_val is not None else chunk_list[list_base + k]
            base = c * _unroll()
            out = []
            for q in range(n_grp):
                reach, fold_chunk = grp_ops[q]
                cr = carry[q]
                cr = jax.lax.cond(
                    jnp.any(reach(c, cr[0])),
                    lambda cr_, b=base, f=fold_chunk: f(b, cr_),
                    lambda cr_: cr_, cr,
                )
                out.append(cr)
            return tuple(out)

        init = tuple(
            (best_t[q * _GROUP_ROWS:(q + 1) * _GROUP_ROWS],
             best_i[q * _GROUP_ROWS:(q + 1) * _GROUP_ROWS])
            for q in range(n_grp)
        )
        parts = jax.lax.fori_loop(0, jnp.maximum(n_g, 0), chunk_body, init)
        best_t = jnp.concatenate([p[0] for p in parts], axis=0)
        best_i = jnp.concatenate([p[1] for p in parts], axis=0)
        return best_t, best_i, t0, t_ex, seg_ok, alive

    # Sphere-chunk traversal per row SLICE: divergent bounce tiles rarely
    # agree on chunks across the whole (64,128) tile, so each
    # (rows/_SLICES, 128) slice walks only ITS phase-A shortlist (with the
    # per-slice tube gate + cond on top).
    rows_g = max(rows // _SLICES, 1)

    def make_group(g):
        sl = slice(g * rows_g, (g + 1) * rows_g)
        n_g = counts_val if counts_val is not None else counts[t * _SLICES + g]
        list_base = (t * _SLICES + g) * n_chunks
        ox_s, oy_s, oz_s = vox[sl], voy[sl], voz[sl]
        dx_s, dy_s, dz_s = vdx[sl], vdy[sl], vdz[sl]
        oo_s, do_s = oo[sl], do[sl]
        t0_s, tex_s, ok_s = t0[sl], t_ex[sl], seg_ok[sl]

        def sphere_one(idx, carry):
            bt, bi = carry
            s = dx_s * cx[idx] + dy_s * cy[idx] + dz_s * cz[idx]
            m = ox_s * cx[idx] + oy_s * cy[idx] + oz_s * cz[idx]
            b_half = do_s - s
            c_full = oo_s - 2.0 * m + cr2[idx]
            disc = b_half * b_half - c_full
            # NaN-compare miss rejection (see _kernel's sphere_one).
            tt = -b_half - jnp.sqrt(disc)
            win = (tt > 0.0) & (
                (tt < bt) | ((tt == bt) & (idx < bi))
            )
            return jnp.where(win, tt, bt), jnp.where(win, idx, bi)

        def tube_reach(tx, ty, tz, tg, tr2, i, bt_c):
            """Any-lane reach of bounding sphere ``i`` of table t* over each
            ray's live segment [t0, min(t_ex, best_t)]."""
            s_g = dx_s * tx[i] + dy_s * ty[i] + dz_s * tz[i]
            m_g = ox_s * tx[i] + oy_s * ty[i] + oz_s * tz[i]
            t1 = jnp.minimum(tex_s, bt_c)
            tc = jnp.clip(s_g - do_s, t0_s, t1)
            dist2 = oo_s - 2.0 * m_g + tg[i] + tc * (2.0 * (do_s - s_g) + tc)
            return ok_s & (t1 >= t0_s) & (dist2 <= tr2[i])

        if _gate_geom() == "aabb":
            # Chunk-AABB slab test over the same live segment (see
            # `_gate_geom()`); reciprocal directions hoisted out of the
            # chunk loop.
            alx, aly, alz = sm["alx"], sm["aly"], sm["alz"]
            ahx, ahy, ahz = sm["ahx"], sm["ahy"], sm["ahz"]
            ivx_s, ivy_s, ivz_s = _srecip(dx_s), _srecip(dy_s), _srecip(dz_s)

            def chunk_reach(i, bt_c):
                t1x = (alx[i] - ox_s) * ivx_s
                t2x = (ahx[i] - ox_s) * ivx_s
                t1y = (aly[i] - oy_s) * ivy_s
                t2y = (ahy[i] - oy_s) * ivy_s
                t1z = (alz[i] - oz_s) * ivz_s
                t2z = (ahz[i] - oz_s) * ivz_s
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                    jnp.minimum(t1z, t2z),
                )
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                    jnp.maximum(t1z, t2z),
                )
                t1 = jnp.minimum(tex_s, bt_c)
                return ok_s & (
                    jnp.maximum(tn, t0_s) <= jnp.minimum(tf, t1)
                )
        else:
            def chunk_reach(i, bt_c):
                return tube_reach(gx, gy, gz, gg, gr2, i, bt_c)

        def fold_sub(sb, cr):
            for u in range(_SUB):
                cr = sphere_one(sb + u, cr)
            return cr

        def chunk_body(k, carry):
            bt, bi = carry
            c = k if counts_val is not None else chunk_list[list_base + k]
            base = c * _unroll()

            def do_chunk(cr):
                if not (_SUB_GATE and _TUBE_GATE) or n_sub == 1:
                    for u in range(_unroll()):
                        cr = sphere_one(base + u, cr)
                    return cr
                # Sub-chunk best-t tube gates: best_t keeps tightening as
                # sub-chunks fold, so later sub-gates cut harder.
                for sub in range(n_sub):
                    reach = tube_reach(
                        sgx, sgy, sgz, sgg, sgr2, c * n_sub + sub, cr[0]
                    )
                    cr = jax.lax.cond(
                        jnp.any(reach),
                        lambda cr_, sb=base + sub * _SUB: fold_sub(sb, cr_),
                        lambda cr_: cr_, cr,
                    )
                return cr

            if not _TUBE_GATE:
                return do_chunk((bt, bi))
            reachable = chunk_reach(c, bt)
            return jax.lax.cond(
                jnp.any(reachable), do_chunk, lambda cr: cr, (bt, bi)
            )

        return jax.lax.fori_loop(
            0, jnp.maximum(n_g, 0), chunk_body, (best_t[sl], best_i[sl])
        )

    parts = [make_group(g) for g in range(_SLICES)]
    best_t = jnp.concatenate([p[0] for p in parts], axis=0)
    best_i = jnp.concatenate([p[1] for p in parts], axis=0)

    return best_t, best_i, t0, t_ex, seg_ok, alive


def _sm_dict(cx, cy, cz, cr2, nx, ny, nz, dpl, rx, ry, rz, ux, uy, uz,
             px, py, pz, ln, wd, bmnx, bmny, bmnz, bmxx, bmxy, bmxz,
             chunk_list, counts, gx, gy, gz, gg, gr2,
             sgx, sgy, sgz, sgg, sgr2,
             alx, aly, alz, ahx, ahy, ahz, slab):
    return dict(
        cx=cx, cy=cy, cz=cz, cr2=cr2, nx=nx, ny=ny, nz=nz, dpl=dpl,
        rx=rx, ry=ry, rz=rz, ux=ux, uy=uy, uz=uz, px=px, py=py, pz=pz,
        ln=ln, wd=wd, bmnx=bmnx, bmny=bmny, bmnz=bmnz, bmxx=bmxx,
        bmxy=bmxy, bmxz=bmxz, chunk_list=chunk_list, counts=counts,
        gx=gx, gy=gy, gz=gz, gg=gg, gr2=gr2,
        sgx=sgx, sgy=sgy, sgz=sgz, sgg=sgg, sgr2=sgr2,
        alx=alx, aly=aly, alz=alz, ahx=ahx, ahy=ahy, ahz=ahz, slab=slab,
    )


def _kernel_shortlist(n_w: int, n_b: int, wall_base: int, box_base: int,
                      tiles_w: int, n_chunks: int):
    """Fold kernel looping only over this tile's shortlisted sphere chunks."""

    def kernel(
        cx, cy, cz, cr2,
        nx, ny, nz, dpl, rx, ry, rz, ux, uy, uz, px, py, pz, ln, wd,
        bmnx, bmny, bmnz, bmxx, bmxy, bmxz,
        chunk_list,  # [tiles * n_chunks] i32 candidate chunk ids (compacted)
        counts,      # [tiles] i32: -1 dead tile, else shortlist length
        gx, gy, gz, gg, gr2,  # chunk bounding spheres: center, |c|^2, (r+pad)^2
        sgx, sgy, sgz, sgg, sgr2,  # sub-chunk bounding spheres (in-chunk gates)
        alx, aly, alz, ahx, ahy, ahz,  # chunk AABBs (the "aabb" gate geometry)
        slab,        # [8] f32: sphere-set AABB lo.xyz, hi.xyz (+2 pad)
        ox, oy, oz, dx, dy, dz, amask,
        bt_ref, bi_ref,
    ):
        sm = _sm_dict(
            cx, cy, cz, cr2, nx, ny, nz, dpl, rx, ry, rz, ux, uy, uz,
            px, py, pz, ln, wd, bmnx, bmny, bmnz, bmxx, bmxy, bmxz,
            chunk_list, counts, gx, gy, gz, gg, gr2,
            sgx, sgy, sgz, sgg, sgr2,
            alx, aly, alz, ahx, ahy, ahz, slab,
        )
        t = pl.program_id(0) * tiles_w + pl.program_id(1)
        vox, voy, voz = ox[:], oy[:], oz[:]
        vdx, vdy, vdz = dx[:], dy[:], dz[:]
        oo = vox * vox + voy * voy + voz * voz
        do = vdx * vox + vdy * voy + vdz * voz
        best_t, best_i, *_ = _shortlist_fold_core(
            sm, t, vox, voy, voz, vdx, vdy, vdz, oo, do, amask[:],
            n_w, n_b, wall_base, box_base, n_chunks,
        )
        bt_ref[:] = best_t
        bi_ref[:] = best_i

    return kernel


def _winner_record_core(
    sm: dict, t_id, best_t, best_i, alive,
    vox, voy, voz, vdx, vdy, vdz,
    n_w: int, n_b: int, wall_base: int, box_base: int, n_chunks: int,
    n_s_pad: int, n_w_pad: int,
):
    """Winner attribute regather + hit-record math (the hit kernel's body).

    Returns ``(t, hit, point xyz, normal xyz, color rgb, amb, met, dif,
    spe, exp)``. See `_regather_core` and `_record_math`.
    """
    acc, hit, is_sphere, is_wall, is_box = _regather_core(
        sm, t_id, best_t, best_i, alive,
        n_w=n_w, n_b=n_b, wall_base=wall_base, box_base=box_base,
        n_chunks=n_chunks, n_s_pad=n_s_pad, n_w_pad=n_w_pad,
    )
    (tt, hpx, hpy, hpz, hnx, hny, hnz) = _record_math(
        acc, best_t, hit, is_sphere, is_wall, is_box,
        vox, voy, voz, vdx, vdy, vdz, n_w=n_w, n_b=n_b,
    )
    colr, colg, colb, amb, met, dif, spe, exq = acc[6:]
    return (tt, hit, hpx, hpy, hpz, hnx, hny, hnz,
            colr, colg, colb, amb, met, dif, spe, exq)


def _regather_core(
    sm: dict, t_id, best_t, best_i, alive,
    *, n_w: int, n_b: int, wall_base: int, box_base: int, n_chunks: int,
    n_s_pad: int, n_w_pad: int, counts_val=None,
):
    """Winner attribute regather, shared by the hit and trace kernels.

    Regather = masked selects over ONLY the winners' own per-slice
    shortlisted chunks (cond-gated on winners in THAT row slice; most
    chunks hold none — a chunk shortlisted by several slices re-selects
    idempotently) plus the few walls/boxes. Returns ``(acc, hit,
    is_sphere, is_wall, is_box)`` where ``acc`` holds the 14 gathered
    attribute planes (geometry g0..g5 per trace.py `_packed_table` columns
    8-13, then the 8 material columns).
    """
    cx, cy, cz = sm["cx"], sm["cy"], sm["cz"]
    nx, ny, nz = sm["nx"], sm["ny"], sm["nz"]
    px, py, pz = sm["px"], sm["py"], sm["pz"]
    bmnx, bmny, bmnz = sm["bmnx"], sm["bmny"], sm["bmnz"]
    bmxx, bmxy, bmxz = sm["bmxx"], sm["bmxy"], sm["bmxz"]
    chunk_list, counts, srad = sm["chunk_list"], sm["counts"], sm["srad"]
    mcr, mcg, mcb, mam = sm["mcr"], sm["mcg"], sm["mcb"], sm["mam"]
    mmt, mdf, msp, mex = sm["mmt"], sm["mdf"], sm["msp"], sm["mex"]

    rows, cols = best_t.shape
    zero = jnp.zeros((rows, cols), jnp.float32)
    hit = best_t < MISS_T
    is_sphere = (best_i >= 0) & (best_i < wall_base)
    is_wall = (best_i >= wall_base) & (best_i < box_base)
    is_box = best_i >= box_base

    # acc = (gathered geometry g0..g5, 8 materials); meanings per type
    # mirror trace.py `_packed_table` columns 8-13.
    acc = (zero,) * 14

    def pick_one(acc, m, vals):
        return tuple(jnp.where(m, v, a) for a, v in zip(acc, vals))

    rows_g = max(rows // _SLICES, 1)

    def make_regather(s_i):
        sl = slice(s_i * rows_g, (s_i + 1) * rows_g)
        is_sphere_s, best_i_s = is_sphere[sl], best_i[sl]
        list_base = (t_id * _SLICES + s_i) * n_chunks

        def regather_chunk(k, acc):
            c = k if counts_val is not None else chunk_list[list_base + k]
            base = c * _unroll()
            in_chunk = (
                is_sphere_s & (best_i_s >= base) & (best_i_s < base + _unroll())
            )

            def do_chunk(acc):
                for u in range(_unroll()):
                    idx = base + u
                    m = is_sphere & (best_i == idx)
                    acc = pick_one(acc, m, (
                        cx[idx], cy[idx], cz[idx], srad[idx], zero, zero,
                        mcr[idx], mcg[idx], mcb[idx], mam[idx], mmt[idx],
                        mdf[idx], msp[idx], mex[idx],
                    ))
                return acc

            return jax.lax.cond(jnp.any(in_chunk), do_chunk, lambda a: a, acc)

        return regather_chunk

    for s_i in range(_SLICES):
        n_s = counts_val if counts_val is not None else (
            counts[t_id * _SLICES + s_i]
        )
        acc = jax.lax.fori_loop(
            0, jnp.maximum(n_s, 0), make_regather(s_i), acc
        )

    if n_w:
        def regather_wall(i, acc):
            m = is_wall & (best_i == wall_base + i)
            j = n_s_pad + i  # padded material row
            return pick_one(acc, m, (
                nx[i], ny[i], nz[i], px[i], py[i], pz[i],
                mcr[j], mcg[j], mcb[j], mam[j], mmt[j], mdf[j],
                msp[j], mex[j],
            ))

        if n_w <= _unroll():
            for i in range(n_w):  # exact — no padded regather sweeps
                acc = regather_wall(i, acc)
        else:
            acc = jax.lax.fori_loop(0, jnp.where(alive, n_w, 0),
                                    regather_wall, acc)

    if n_b:
        def regather_box(i, acc):
            m = is_box & (best_i == box_base + i)
            j = n_s_pad + n_w_pad + i
            return pick_one(acc, m, (
                bmnx[i], bmny[i], bmnz[i], bmxx[i], bmxy[i], bmxz[i],
                mcr[j], mcg[j], mcb[j], mam[j], mmt[j], mdf[j],
                msp[j], mex[j],
            ))

        if n_b <= _unroll():
            for i in range(n_b):
                acc = regather_box(i, acc)
        else:
            acc = jax.lax.fori_loop(0, jnp.where(alive, n_b, 0),
                                    regather_box, acc)

    return acc, hit, is_sphere, is_wall, is_box


def _record_math(acc, best_t, hit, is_sphere, is_wall, is_box,
                 vox, voy, voz, vdx, vdy, vdz, *, n_w: int, n_b: int):
    """Winner t / hit point / normal from gathered attributes (pure math).

    Mirrors trace.py `_mm_hit` formula-for-formula. Shared three ways: the
    hit-record kernel, the forward trace megakernel, and — via `jax.vjp`
    inside the BACKWARD trace kernel — the training backward, so forward
    and backward always differentiate the value-identical function.
    ``best_t``/masks are selection constants (stop-gradient by
    construction); ``acc`` (the 14 gathered attribute planes) and the rays
    are the differentiable inputs.
    """
    g0, g1, g2, g3, g4, g5 = acc[:6]

    # --- winner t per type (mirrors _mm_hit, trace.py) ---
    tt = best_t
    bq = 2.0 * (vdx * (vox - g0) + vdy * (voy - g1) + vdz * (voz - g2))
    cq = (
        (vox - g0) * (vox - g0) + (voy - g1) * (voy - g1)
        + (voz - g2) * (voz - g2) - g3 * g3
    )
    det = bq * bq - 4.0 * cq
    # STRICT det > 0 (not >=): sqrt'(0) is inf, and miss lanes regather
    # all-zero attributes which (with the camera at the origin) make det
    # EXACTLY 0 — reverse mode then forms 0 * inf = NaN on every sky
    # pixel. XLA's simplifier happens to drop the masked mul(x, 0);
    # Mosaic does not (caught by tests_tpu/ on the compiled kernel).
    # det == 0 true-graze hits fall back to the fold's exact t below.
    pos = det > 0.0
    sq = jnp.sqrt(jnp.where(pos, det, 1.0))
    t_s = jnp.where(pos, 0.5 * (-bq - sq), 1.0)
    # `& pos`: at grazing hits the fold's discriminant (half-b form, its
    # own FMA fusion) can be >=0 while this full-form recompute's is <=0 —
    # selecting the placeholder put the hit point ~t=1 and the resulting
    # non-unit normal (|n| up to ~80) overflowed base^exponent to inf
    # (observed: 15 px on a 1080p grid-64 frame). Fall back to the fold's
    # exact t; mirrors _winner_t/_mm_hit (trace.py) for VJP pairing.
    tt = jnp.where(hit & is_sphere & pos, t_s, tt)
    if n_w:
        denom = vdx * g0 + vdy * g1 + vdz * g2
        ok = jnp.abs(denom) > 1e-12
        t_w = (
            (g3 - vox) * g0 + (g4 - voy) * g1 + (g5 - voz) * g2
        ) / jnp.where(ok, denom, 1.0)
        tt = jnp.where(hit & is_wall & ok, t_w, tt)
    if n_b:
        ivx, ivy, ivz = _srecip(vdx), _srecip(vdy), _srecip(vdz)
        t_b = jnp.maximum(
            jnp.maximum(
                jnp.minimum((g0 - vox) * ivx, (g3 - vox) * ivx),
                jnp.minimum((g1 - voy) * ivy, (g4 - voy) * ivy),
            ),
            jnp.minimum((g2 - voz) * ivz, (g5 - voz) * ivz),
        )
        tt = jnp.where(hit & is_box, t_b, tt)

    t_safe = jnp.where(hit, tt, 1.0)
    hpx = vox + vdx * t_safe
    hpy = voy + vdy * t_safe
    hpz = voz + vdz * t_safe

    # --- winner normal per type (mirrors _mm_hit) ---
    inv_r = 1.0 / jnp.maximum(g3, 1e-12)
    hnx = (hpx - g0) * inv_r
    hny = (hpy - g1) * inv_r
    hnz = (hpz - g2) * inv_r
    if n_w:
        hnx = jnp.where(is_sphere, hnx, g0)
        hny = jnp.where(is_sphere, hny, g1)
        hnz = jnp.where(is_sphere, hnz, g2)
    if n_b:
        ivx, ivy, ivz = _srecip(vdx), _srecip(vdy), _srecip(vdz)
        tx = (jnp.where(vdx >= 0, g0, g3) - vox) * ivx
        ty = (jnp.where(vdy >= 0, g1, g4) - voy) * ivy
        tz = (jnp.where(vdz >= 0, g2, g5) - voz) * ivz
        bx = (tx >= ty) & (tx >= tz)
        by = jnp.logical_not(bx) & (ty >= tz)
        bz = jnp.logical_not(bx) & jnp.logical_not(by)
        hnx = jnp.where(is_box, jnp.where(bx, -jnp.sign(vdx), 0.0), hnx)
        hny = jnp.where(is_box, jnp.where(by, -jnp.sign(vdy), 0.0), hny)
        hnz = jnp.where(is_box, jnp.where(bz, -jnp.sign(vdz), 0.0), hnz)
    hnx = jnp.where(hit, hnx, 0.0)
    hny = jnp.where(hit, hny, 0.0)
    hnz = jnp.where(hit, hnz, 1.0)

    return tt, hpx, hpy, hpz, hnx, hny, hnz


def _level_math(acc, rays6, w, t_sel, hit, is_sphere, is_wall, is_box,
                pt_lights, sun_lights, sky, *, n_w: int, n_b: int,
                is_last: bool):
    """One trace level's differentiable math, post-selection and
    post-gather: winner record + Blinn-Phong shading + sky + accumulator
    increment + mirror reflection.

    Pure function of (gathered attributes ``acc``, rays, throughput ``w``,
    light/sky scalars) at FIXED selections (``t_sel``: the level's saved
    per-ray t; the hit/type masks) — the forward trace megakernel calls it
    directly and the backward trace kernel `jax.vjp`s it, so the training
    gradient is of the exact forward computation. Mirrors trace.py
    `_mm_hit` + `shade_soa`/`background_soa` + `trace_soa`'s ray update
    (reference: recursive_ray_tracing, main.cpp:89-119).

    ``pt_lights``/``sun_lights``: tuples of per-light 6-scalar tuples
    (position/direction xyz + color rgb); ``sky``: 10 scalars. Returns
    ``(t_out, ar_inc, ag_inc, ab_inc, w_next, nox, noy, noz, ndx, ndy,
    ndz)``.
    """
    vox, voy, voz, vdx, vdy, vdz = rays6
    (tt, hpx, hpy, hpz, hnx, hny, hnz) = _record_math(
        acc, t_sel, hit, is_sphere, is_wall, is_box,
        vox, voy, voz, vdx, vdy, vdz, n_w=n_w, n_b=n_b,
    )
    colr, colg, colb, amb, met, dif, spe, exq = acc[6:]

    # --- Blinn-Phong shading (mirrors shade_soa / _light_terms) ---
    vwx, vwy, vwz = -vdx, -vdy, -vdz

    def light_terms(ldx, ldy, ldz):
        diffuse = jnp.maximum(ldx * hnx + ldy * hny + ldz * hnz, 0.0)
        hvx, hvy, hvz = vwx + ldx, vwy + ldy, vwz + ldz
        n2 = hvx * hvx + hvy * hvy + hvz * hvz
        hsc = jax.lax.rsqrt(jnp.where(n2 > 1e-12, n2, 1.0))
        base = jnp.maximum(
            (hvx * hnx + hvy * hny + hvz * hnz) * hsc, 0.0
        )
        base_safe = jnp.where(base > 0.0, base, 1.0)
        specular = jnp.where(
            base > 0.0, jnp.exp(exq * jnp.log(base_safe)), 0.0
        )
        return diffuse, specular

    ir = jnp.zeros_like(w)
    ig = jnp.zeros_like(w)
    ib = jnp.zeros_like(w)
    for (plx, ply, plz, pcr, pcg, pcb) in pt_lights:
        ldx = plx - hpx
        ldy = ply - hpy
        ldz = plz - hpz
        n2 = ldx * ldx + ldy * ldy + ldz * ldz
        inv = jax.lax.rsqrt(jnp.maximum(n2, 1e-12))
        diffuse, specular = light_terms(ldx * inv, ldy * inv, ldz * inv)
        term = diffuse * dif + specular * spe
        ir = ir + pcr * term
        ig = ig + pcg * term
        ib = ib + pcb * term
    for (sdx, sdy, sdz, scr, scg, scb) in sun_lights:
        diffuse, specular = light_terms(
            jnp.full_like(w, sdx), jnp.full_like(w, sdy),
            jnp.full_like(w, sdz),
        )
        term = diffuse * dif + specular * spe
        ir = ir + scr * term
        ig = ig + scg * term
        ib = ib + scb * term
    lr = colr * (ir + amb)
    lg = colg * (ig + amb)
    lb = colb * (ib + amb)

    # --- sky background (mirrors background_soa) ---
    z = vdz
    z_pos = jnp.where(z > 0.0, z, 1.0)
    grad = jnp.where(z > 0.0, jnp.exp(sky[9] * jnp.log(z_pos)), 0.0)
    skr = jnp.where(z < 0.0, sky[6], sky[0] + (sky[3] - sky[0]) * grad)
    skg = jnp.where(z < 0.0, sky[7], sky[1] + (sky[4] - sky[1]) * grad)
    skb = jnp.where(z < 0.0, sky[8], sky[2] + (sky[5] - sky[2]) * grad)

    # --- accumulator increment (mirrors trace_soa's front-to-back form) ---
    if is_last:
        hcr, hcg, hcb = lr, lg, lb
    else:
        one_m = 1.0 - met
        hcr, hcg, hcb = lr * one_m, lg * one_m, lb * one_m
    take = hit & (w > 0.0)
    ar_inc = jnp.where(take, hcr, skr) * w
    ag_inc = jnp.where(take, hcg, skg) * w
    ab_inc = jnp.where(take, hcb, skb) * w

    t_out = jnp.where(hit, tt, t_sel)

    # --- reflect (mirrors trace_soa's ray update) ---
    w_next = w * jnp.where(hit, met, 0.0)
    nox = jnp.where(hit, hpx + hnx * 1e-4, vox)
    noy = jnp.where(hit, hpy + hny * 1e-4, voy)
    noz = jnp.where(hit, hpz + hnz * 1e-4, voz)
    dn2 = 2.0 * (vdx * hnx + vdy * hny + vdz * hnz)
    ndx = jnp.where(hit, vdx - hnx * dn2, vdx)
    ndy = jnp.where(hit, vdy - hny * dn2, vdy)
    ndz = jnp.where(hit, vdz - hnz * dn2, vdz)

    return (t_out, ar_inc, ag_inc, ab_inc, w_next,
            nox, noy, noz, ndx, ndy, ndz)


def _kernel_shortlist_hit(n_w: int, n_b: int, wall_base: int, box_base: int,
                          tiles_w: int, n_chunks: int, n_s_pad: int,
                          n_w_pad: int):
    """Shortlist fold + in-kernel winner regather + hit-record math.

    Emits the FULL per-ray hit record (t, index, point, normal, material)
    so large scenes skip the one-hot-matmul attribute gather entirely
    (ops/trace.py `_mm_hit` cost ~3.2 ms/level at 1080p/1024 spheres).
    The winner's attributes come from a masked-select sweep over ONLY the
    tile's shortlisted sphere chunks (gated: most chunks hold no winners)
    plus the few walls/boxes; the winner t/point/normal math then mirrors
    `_mm_hit` (trace.py) formula-for-formula, because the training path's
    custom VJP differentiates `_mm_hit` as this kernel's backward.
    """

    def kernel(
        cx, cy, cz, cr2,
        nx, ny, nz, dpl, rx, ry, rz, ux, uy, uz, px, py, pz, ln, wd,
        bmnx, bmny, bmnz, bmxx, bmxy, bmxz,
        chunk_list, counts, gx, gy, gz, gg, gr2,
        sgx, sgy, sgz, sgg, sgr2,
        alx, aly, alz, ahx, ahy, ahz, slab,
        srad,  # [n_s_pad] sphere radii (for the winner normal)
        mcr, mcg, mcb, mam, mmt, mdf, msp, mex,  # padded global materials
        ox, oy, oz, dx, dy, dz, amask,
        t_ref, i_ref, hpx_ref, hpy_ref, hpz_ref, hnx_ref, hny_ref, hnz_ref,
        colr_ref, colg_ref, colb_ref, amb_ref, met_ref, dif_ref, spe_ref,
        exq_ref,
    ):
        sm = _sm_dict(
            cx, cy, cz, cr2, nx, ny, nz, dpl, rx, ry, rz, ux, uy, uz,
            px, py, pz, ln, wd, bmnx, bmny, bmnz, bmxx, bmxy, bmxz,
            chunk_list, counts, gx, gy, gz, gg, gr2,
            sgx, sgy, sgz, sgg, sgr2,
            alx, aly, alz, ahx, ahy, ahz, slab,
        )
        sm.update(srad=srad, mcr=mcr, mcg=mcg, mcb=mcb, mam=mam, mmt=mmt,
                  mdf=mdf, msp=msp, mex=mex)
        t_id = pl.program_id(0) * tiles_w + pl.program_id(1)
        vox, voy, voz = ox[:], oy[:], oz[:]
        vdx, vdy, vdz = dx[:], dy[:], dz[:]
        oo = vox * vox + voy * voy + voz * voz
        do = vdx * vox + vdy * voy + vdz * voz
        best_t, best_i, t0, t_ex, seg_ok, alive = _shortlist_fold_core(
            sm, t_id, vox, voy, voz, vdx, vdy, vdz, oo, do, amask[:],
            n_w, n_b, wall_base, box_base, n_chunks,
        )

        rec = _winner_record_core(
            sm, t_id, best_t, best_i, alive,
            vox, voy, voz, vdx, vdy, vdz,
            n_w, n_b, wall_base, box_base, n_chunks, n_s_pad, n_w_pad,
        )
        (tt, hit, hpx, hpy, hpz, hnx, hny, hnz,
         colr, colg, colb, amb, met, dif, spe, exq) = rec

        t_ref[:] = jnp.where(hit, tt, best_t)
        i_ref[:] = best_i
        hpx_ref[:] = hpx
        hpy_ref[:] = hpy
        hpz_ref[:] = hpz
        hnx_ref[:] = hnx
        hny_ref[:] = hny
        hnz_ref[:] = hnz
        colr_ref[:] = colr
        colg_ref[:] = colg
        colb_ref[:] = colb
        amb_ref[:] = amb
        met_ref[:] = met
        dif_ref[:] = dif
        spe_ref[:] = spe
        exq_ref[:] = exq

    return kernel


def _chunk_reach_capacity() -> int:
    """Chunks that fit in the stats block's free rows (per-chunk tube-reach).

    Rows [0, _SLICES) hold slice stats; rows [_SLICES, 8) are free —
    (8 - _SLICES) * 128 lanes, one per chunk."""
    return (8 - _SLICES) * _SL_C


def _reach_stats_rows(slab, ox, oy, oz, dx, dy, dz, w_alive,
                      gt=None, n_chunks: int = 0):
    """(8, _SL_C) PER-SLICE reach statistics — the per-ray half of phase A.

    Row ``s`` holds the stats of row slice ``s`` (rows [s*rows/8,
    (s+1)*rows/8) of the tile). Lane layout per row: [0..5] clipped-segment
    reach AABB (x lo/hi, y lo/hi, z lo/hi — RAW, the consumer adds
    ``_AABB_PAD``), [6..8] sums of segment-start coordinates, [9] used-lane
    count, [10] slice-alive flag. Consumed by ``_stats_to_phase_a`` +
    ``_phase_a_from_stats``. Lives in the kernels (trace megakernel for
    bounce levels; ``_ray_stats`` for level 0) so the [H, W] per-ray
    intermediates never touch HBM — the pure-XLA formulation of these
    reductions measured 8.4 ms at 1080p (vs ~0.3 ms in-kernel) on the v5e.

    With ``gt`` (the chunk bounding-sphere tables) and ``n_chunks``, rows
    [_SLICES, 8) additionally carry the tile's PER-CHUNK tube-reach union
    (chunk ``c`` at row ``_SLICES + c // 128``, lane ``c % 128``): 1.0 iff
    ANY used lane's slab-clipped segment passes within the chunk's bounding
    sphere. Phase A intersects its AABB-overlap accept set with this, which
    matters for DIVERGENT bounce tiles: their union reach AABB covers most
    of the scene (measured grid-1024 level 2-3: 58-62 of 64 chunks accepted
    by AABB) while the per-lane tube union stays small (~15 of 32 chunks) —
    the fold loop then skips the difference entirely instead of paying a
    Mosaic ``lax.cond`` pipeline stall per gated-off chunk.
    """
    def axis_iv2(o_c, d_c, lo_c, hi_c):
        inv = _srecip(d_c)
        t1, t2 = (lo_c - o_c) * inv, (hi_c - o_c) * inv
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    ex_lo, ex_hi = axis_iv2(ox, dx, slab[0], slab[3])
    ey_lo, ey_hi = axis_iv2(oy, dy, slab[1], slab[4])
    ez_lo, ez_hi = axis_iv2(oz, dz, slab[2], slab[5])
    t0n = jnp.maximum(jnp.maximum(jnp.maximum(ex_lo, ey_lo), ez_lo), 0.0)
    t_exn = jnp.minimum(jnp.minimum(ex_hi, ey_hi), ez_hi)
    usedn = (w_alive > 0.0) & (t_exn >= t0n) & (t_exn > 0.0)
    BIG = jnp.float32(1e30)
    rows = ox.shape[0]
    rows_g = max(rows // _SLICES, 1)
    srow = jnp.zeros((8, _SL_C), jnp.float32)
    row = jax.lax.broadcasted_iota(jnp.int32, (8, _SL_C), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, _SL_C), 1)
    for s_i in range(_SLICES):
        sl = slice(s_i * rows_g, (s_i + 1) * rows_g)
        used_s = usedn[sl]
        t0_s, tex_s = t0n[sl], t_exn[sl]
        vals = []
        for o_c, d_c in ((ox[sl], dx[sl]), (oy[sl], dy[sl]),
                         (oz[sl], dz[sl])):
            p1 = o_c + t0_s * d_c
            p2 = o_c + tex_s * d_c
            vals.append(jnp.min(jnp.where(used_s, jnp.minimum(p1, p2), BIG)))
            vals.append(jnp.max(jnp.where(used_s, jnp.maximum(p1, p2), -BIG)))
        for o_c, d_c in ((ox[sl], dx[sl]), (oy[sl], dy[sl]),
                         (oz[sl], dz[sl])):
            vals.append(jnp.sum(jnp.where(used_s, o_c + t0_s * d_c, 0.0)))
        vals.append(jnp.sum(used_s.astype(jnp.float32)))
        vals.append(jnp.any(w_alive[sl] > 0.0).astype(jnp.float32))
        for idx, v in enumerate(vals):
            srow = jnp.where((row == s_i) & (lane == idx), v, srow)
    if n_chunks and gt is not None:
        gx, gy, gz, gg, gr2, alx, aly, alz, ahx, ahy, ahz = gt
        oo = ox * ox + oy * oy + oz * oz
        do = dx * ox + dy * oy + dz * oz
        if _gate_geom() == "aabb":
            ivx, ivy, ivz = _srecip(dx), _srecip(dy), _srecip(dz)
        for c in range(n_chunks):
            # Same test as _shortlist_fold_core's in-kernel gate (per
            # _gate_geom()), with best_t unknown (t_exn clip only) —
            # strictly conservative.
            if _gate_geom() == "aabb":
                t1x, t2x = (alx[c] - ox) * ivx, (ahx[c] - ox) * ivx
                t1y, t2y = (aly[c] - oy) * ivy, (ahy[c] - oy) * ivy
                t1z, t2z = (alz[c] - oz) * ivz, (ahz[c] - oz) * ivz
                tn = jnp.maximum(
                    jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
                    jnp.minimum(t1z, t2z),
                )
                tf = jnp.minimum(
                    jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
                    jnp.maximum(t1z, t2z),
                )
                hit_c = jnp.maximum(tn, t0n) <= jnp.minimum(tf, t_exn)
            else:
                s_g = dx * gx[c] + dy * gy[c] + dz * gz[c]
                m_g = ox * gx[c] + oy * gy[c] + oz * gz[c]
                tc = jnp.clip(s_g - do, t0n, t_exn)
                dist2 = (
                    oo - 2.0 * m_g + gg[c] + tc * (2.0 * (do - s_g) + tc)
                )
                hit_c = dist2 <= gr2[c]
            v = jnp.max(
                jnp.where(usedn & hit_c, 1.0, 0.0)
            )
            srow = jnp.where(
                (row == _SLICES + c // _SL_C) & (lane == c % _SL_C), v, srow
            )
    return srow


def _stats_to_phase_a(s_all):
    """Unpack kernel-emitted reach stats into `_phase_a_from_stats` inputs.

    ``s_all`` is [th, tw, 8, _SL_C] with one stats row per row SLICE;
    returns per-slice fields shaped [th, tw, _SLICES]."""
    s0 = s_all[:, :, :_SLICES, :]
    cnt = jnp.maximum(s0[..., 9], 1.0)
    return (
        s0[..., 0] - _AABB_PAD, s0[..., 1] + _AABB_PAD,
        s0[..., 2] - _AABB_PAD, s0[..., 3] + _AABB_PAD,
        s0[..., 4] - _AABB_PAD, s0[..., 5] + _AABB_PAD,
        s0[..., 6] / cnt, s0[..., 7] / cnt, s0[..., 8] / cnt,
        s0[..., 10] > 0.0,
    )


def _stats_to_chunk_reach(s_all, n_chunks: int):
    """[th, tw, n_chunks] per-tile tube-reach union from the stats block's
    free rows (see `_reach_stats_rows`); requires the emitting kernel to
    have been built with the same ``n_chunks``."""
    th, tw = s_all.shape[:2]
    nrows = -(-n_chunks // _SL_C)
    flat = s_all[:, :, _SLICES:_SLICES + nrows, :].reshape(
        th, tw, nrows * _SL_C
    )
    return flat[..., :n_chunks] > 0.0


def _kernel_ray_stats(n_chunks: int):
    def kernel(slab, gx, gy, gz, gg, gr2, alx, aly, alz, ahx, ahy, ahz,
               ox, oy, oz, dx, dy, dz, amask, stats_ref):
        stats_ref[0, 0] = _reach_stats_rows(
            slab, ox[:], oy[:], oz[:], dx[:], dy[:], dz[:], amask[:],
            gt=(gx, gy, gz, gg, gr2, alx, aly, alz, ahx, ahy, ahz),
            n_chunks=n_chunks,
        )

    return kernel


@_jit_cfg(static_argnames=("sl_r", "n_chunks", "interpret"))
def _ray_stats(slab, rays, amask, gtables=None, *, sl_r: int,
               n_chunks: int = 0, interpret: bool):
    """Per-tile reach stats [th, tw, 8, _SL_C] from a padded ray batch.

    With ``gtables``/``n_chunks`` the free stats rows carry the per-tile
    per-chunk tube-reach union (see `_reach_stats_rows`)."""
    h, w = rays[0].shape
    grid = (h // sl_r, w // _SL_C)
    th, tw = grid
    if gtables is None:
        gtables = tuple(jnp.zeros((1,), jnp.float32) for _ in range(11))
        n_chunks = 0
    gtables = tuple(gtables)  # 11 chunk-level tables (spheres + AABBs)
    spec = pl.BlockSpec(
        (sl_r, _SL_C), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
    )
    stats_spec = pl.BlockSpec(
        (1, 1, 8, _SL_C), lambda i, j, *_: (i, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=12,
        grid=grid,
        in_specs=[spec] * 7,
        out_specs=stats_spec,
    )
    return pl.pallas_call(
        _kernel_ray_stats(n_chunks),
        out_shape=_out_struct((th, tw, 8, _SL_C), jnp.float32, rays[0]),
        grid_spec=grid_spec,
        interpret=interpret,
    )(slab, *gtables, *rays, amask)


def _kernel_trace_level(n_w: int, n_b: int, wall_base: int, box_base: int,
                        tiles_w: int, n_chunks: int, n_s_pad: int,
                        n_w_pad: int, n_pt: int, n_sun: int, is_last: bool,
                        emit_stats: bool = True):
    """One FULL trace level in one kernel: fold + winner record + Blinn-
    Phong shading + sky + throughput/accumulator update + mirror reflection.

    The megakernel form of one iteration of trace.py `trace_soa`'s bounce
    loop (reference: recursive_ray_tracing, main.cpp:89-119): per ray-tile,
    everything between two bounce levels happens in VMEM — the 16-field hit
    record never round-trips HBM and the shading/reflection XLA glue
    disappears. Shading mirrors `shade_soa`/`background_soa` and the ray
    update mirrors `trace_soa` so the whole-trace custom VJP (trace.py) can
    differentiate the XLA implementation at this kernel's selections.
    """

    def kernel(
        cx, cy, cz, cr2,
        nx, ny, nz, dpl, rx, ry, rz, ux, uy, uz, px, py, pz, ln, wd,
        bmnx, bmny, bmnz, bmxx, bmxy, bmxz,
        chunk_list, counts, gx, gy, gz, gg, gr2,
        sgx, sgy, sgz, sgg, sgr2,
        alx, aly, alz, ahx, ahy, ahz, slab,
        srad, mcr, mcg, mcb, mam, mmt, mdf, msp, mex,
        lpx, lpy, lpz, lcr, lcg, lcb,  # point lights [n_pt or 1]
        sdx, sdy, sdz, scr, scg, scb,  # sun lights (pre-unit dirs)
        sky,  # [10]: horizon rgb, zenith rgb, ground rgb, gradient exponent
        ox, oy, oz, dx, dy, dz, w_in, ar_in, ag_in, ab_in,
        t_ref, i_ref, ar_ref, ag_ref, ab_ref, w_ref,
        nox_ref, noy_ref, noz_ref, ndx_ref, ndy_ref, ndz_ref, stats_ref,
    ):
        sm = _sm_dict(
            cx, cy, cz, cr2, nx, ny, nz, dpl, rx, ry, rz, ux, uy, uz,
            px, py, pz, ln, wd, bmnx, bmny, bmnz, bmxx, bmxy, bmxz,
            chunk_list, counts, gx, gy, gz, gg, gr2,
            sgx, sgy, sgz, sgg, sgr2,
            alx, aly, alz, ahx, ahy, ahz, slab,
        )
        sm.update(srad=srad, mcr=mcr, mcg=mcg, mcb=mcb, mam=mam, mmt=mmt,
                  mdf=mdf, msp=msp, mex=mex)
        t_id = pl.program_id(0) * tiles_w + pl.program_id(1)
        vox, voy, voz = ox[:], oy[:], oz[:]
        vdx, vdy, vdz = dx[:], dy[:], dz[:]
        w = w_in[:]
        oo = vox * vox + voy * voy + voz * voz
        do = vdx * vox + vdy * voy + vdz * voz
        best_t, best_i, t0, t_ex, seg_ok, alive = _shortlist_fold_core(
            sm, t_id, vox, voy, voz, vdx, vdy, vdz, oo, do, w,
            n_w, n_b, wall_base, box_base, n_chunks,
        )
        acc, hit, is_sphere, is_wall, is_box = _regather_core(
            sm, t_id, best_t, best_i, alive,
            n_w=n_w, n_b=n_b, wall_base=wall_base, box_base=box_base,
            n_chunks=n_chunks, n_s_pad=n_s_pad, n_w_pad=n_w_pad,
        )
        pt_lights = tuple(
            (lpx[li], lpy[li], lpz[li], lcr[li], lcg[li], lcb[li])
            for li in range(n_pt)
        )
        sun_lights = tuple(
            (sdx[si], sdy[si], sdz[si], scr[si], scg[si], scb[si])
            for si in range(n_sun)
        )
        sky_s = tuple(sky[i] for i in range(10))
        (t_out, ar_inc, ag_inc, ab_inc, w_next,
         nox, noy, noz, ndx, ndy, ndz) = _level_math(
            acc, (vox, voy, voz, vdx, vdy, vdz), w, best_t,
            hit, is_sphere, is_wall, is_box, pt_lights, sun_lights, sky_s,
            n_w=n_w, n_b=n_b, is_last=is_last,
        )
        ar_ref[:] = ar_in[:] + ar_inc
        ag_ref[:] = ag_in[:] + ag_inc
        ab_ref[:] = ab_in[:] + ab_inc
        t_ref[:] = t_out
        i_ref[:] = best_i
        w_ref[:] = w_next
        nox_ref[:] = nox
        noy_ref[:] = noy
        noz_ref[:] = noz
        ndx_ref[:] = ndx
        ndy_ref[:] = ndy
        ndz_ref[:] = ndz

        # --- next-level reach statistics (the per-ray half of phase A,
        # computed here while the next rays are still in VMEM); skipped
        # when the next level re-tiles (its stats come from _ray_stats) or
        # this is the last level ---
        if is_last or not emit_stats:
            stats_ref[0, 0] = jnp.zeros((8, _SL_C), jnp.float32)
        else:
            with_reach = (
                _TUBE_SHORTLIST and 0 < n_chunks <= _chunk_reach_capacity()
            )
            stats_ref[0, 0] = _reach_stats_rows(
                slab, nox, noy, noz, ndx, ndy, ndz, w_next,
                gt=(
                    (gx, gy, gz, gg, gr2, alx, aly, alz, ahx, ahy, ahz)
                    if with_reach else None
                ),
                n_chunks=n_chunks if with_reach else 0,
            )

    return kernel


@_jit_cfg(static_argnames=("n_w", "n_b", "wall_base", "box_base", "tiles_w",
                     "n_chunks", "n_s_pad", "n_w_pad", "n_pt", "n_sun",
                     "is_last", "emit_stats", "sl_r", "interpret"))
def _trace_level(tables, chunk_list, counts, gtables, slab, mats, lights,
                 sky, rays, state, *, n_w: int, n_b: int, wall_base: int,
                 box_base: int, tiles_w: int, n_chunks: int, n_s_pad: int,
                 n_w_pad: int, n_pt: int, n_sun: int, is_last: bool,
                 emit_stats: bool, sl_r: int, interpret: bool):
    h, w = rays[0].shape
    grid = (h // sl_r, w // _SL_C)
    th, tw = grid
    spec = pl.BlockSpec(
        (sl_r, _SL_C), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
    )
    stats_spec = pl.BlockSpec(
        (1, 1, 8, _SL_C), lambda i, j, *_: (i, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=38 + 6 + 9 + 13,
        grid=grid,
        in_specs=[spec] * 10,
        out_specs=(spec,) * 12 + (stats_spec,),
    )
    f32 = _out_struct((h, w), jnp.float32, rays[0])
    return pl.pallas_call(
        _kernel_trace_level(n_w, n_b, wall_base, box_base, tiles_w,
                            n_chunks, n_s_pad, n_w_pad, n_pt, n_sun,
                            is_last, emit_stats),
        out_shape=(f32, _out_struct((h, w), jnp.int32, rays[0]))
        + (f32,) * 10
        + (_out_struct((th, tw, 8, _SL_C), jnp.float32, rays[0]),),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*tables, chunk_list, counts, *gtables, slab, *mats, *lights, sky,
      *rays, *state)


# Fused whole-trace kernel: for scenes small enough that per-tile
# shortlists cannot pay (<= this many chunks), trace EVERY reflection
# level inside one kernel — rays/throughput/accumulator never leave VMEM
# between levels (the per-level chain writes+rereads ~22 [H,W] planes per
# boundary), and tiles whose lanes all died (sky) cond-skip whole levels
# INCLUDING the shading/reflection math the per-level kernels always
# executed. Measured (v5e, 2026-08-20): demo 1080p d3 4.14 -> 3.34 ms,
# grid-64 1080p d3 11.85 -> 9.39 ms. The depth cap was 4 when the
# padded-count fold made deep cond-wrapped level chains expensive
# (640x640 d10 fused lost 4.19 vs 3.59); after the exact-count fold the
# balance flipped (d10 fused WINS 2.53 vs 3.44 ms) — cap now 10, the
# reference's own maximum recursion depth (main.cpp:23). The chunk cap
# stays 4: an 8-chunk (128-sphere) scene measured 9.55 ms per-level vs
# 10.18 fused (v5e 2026-08-20, 1080p d3) — identity shortlists make every
# tile fold every chunk, and past 4 chunks the per-tile shortlists beat
# the saved inter-level HBM.
_FUSED_MAX_CHUNKS = int(os.environ.get("RT_FUSED_MAX_CHUNKS", "4"))
_FUSED_MAX_DEPTH = int(os.environ.get("RT_FUSED_MAX_DEPTH", "10"))
# Fused TRAINING forward (emit per-level residuals from the whole-trace
# kernel instead of running the per-level chain); A/B knob.
_FUSED_RESID = os.environ.get("RT_FUSED_RESID", "1") != "0"


def _kernel_trace_whole(n_w: int, n_b: int, wall_base: int, box_base: int,
                        n_chunks: int, n_s_pad: int, n_w_pad: int,
                        n_pt: int, n_sun: int, depth: int,
                        emit_res: bool = False):
    """Fused whole-trace kernel; with ``emit_res`` it additionally writes
    each bounce level's INPUT rays + throughput (7 planes per level k >= 1;
    level 0's inputs are the caller's own rays) so the TRAINING forward can
    run fused too — the backward trace kernels consume exactly these
    residuals. out_refs layout: [ar, ag, ab], (t, i) per level, then (if
    emit_res) (ox, oy, oz, dx, dy, dz, w) per level 1..depth."""
    def kernel(
        cx, cy, cz, cr2,
        nx, ny, nz, dpl, rx, ry, rz, ux, uy, uz, px, py, pz, ln, wd,
        bmnx, bmny, bmnz, bmxx, bmxy, bmxz,
        gx, gy, gz, gg, gr2, sgx, sgy, sgz, sgg, sgr2,
        alx, aly, alz, ahx, ahy, ahz, slab,
        srad, mcr, mcg, mcb, mam, mmt, mdf, msp, mex,
        lpx, lpy, lpz, lcr, lcg, lcb,
        sdx, sdy, sdz, scr, scg, scb,
        sky,
        ox, oy, oz, dx, dy, dz, amask,
        *out_refs,  # ar, ag, ab, then (t_ref, i_ref) per level
    ):
        sm = _sm_dict(
            cx, cy, cz, cr2, nx, ny, nz, dpl, rx, ry, rz, ux, uy, uz,
            px, py, pz, ln, wd, bmnx, bmny, bmnz, bmxx, bmxy, bmxz,
            None, None,  # chunk_list/counts unused under counts_val
            gx, gy, gz, gg, gr2, sgx, sgy, sgz, sgg, sgr2,
            alx, aly, alz, ahx, ahy, ahz, slab,
        )
        sm.update(srad=srad, mcr=mcr, mcg=mcg, mcb=mcb, mam=mam, mmt=mmt,
                  mdf=mdf, msp=msp, mex=mex)
        pt_lights = tuple(
            (lpx[li], lpy[li], lpz[li], lcr[li], lcg[li], lcb[li])
            for li in range(n_pt)
        )
        sun_lights = tuple(
            (sdx[si], sdy[si], sdz[si], scr[si], scg[si], scb[si])
            for si in range(n_sun)
        )
        sky_s = tuple(sky[i] for i in range(10))

        rays6 = (ox[:], oy[:], oz[:], dx[:], dy[:], dz[:])
        w = amask[:]
        zero = jnp.zeros_like(w)
        acc3 = (zero, zero, zero)
        miss_t = jnp.full_like(w, MISS_T)
        miss_i = jnp.full_like(w, -1.0).astype(jnp.int32)

        for k in range(depth + 1):
            is_last = k == depth
            if emit_res and k >= 1:
                res0 = 3 + 2 * (depth + 1) + 7 * (k - 1)
                for j in range(6):
                    out_refs[res0 + j][:] = rays6[j]
                out_refs[res0 + 6][:] = w

            def run_level(op, is_last=is_last):
                rays6, w, acc3 = op
                vox, voy, voz, vdx, vdy, vdz = rays6
                oo = vox * vox + voy * voy + voz * voz
                do = vdx * vox + vdy * voy + vdz * voz
                cval = jnp.int32(n_chunks)
                best_t, best_i, *_ = _shortlist_fold_core(
                    sm, 0, vox, voy, voz, vdx, vdy, vdz, oo, do, w,
                    n_w, n_b, wall_base, box_base, n_chunks,
                    counts_val=cval,
                )
                acc, hit, is_sphere, is_wall, is_box = _regather_core(
                    sm, 0, best_t, best_i, cval >= 0,
                    n_w=n_w, n_b=n_b, wall_base=wall_base,
                    box_base=box_base, n_chunks=n_chunks, n_s_pad=n_s_pad,
                    n_w_pad=n_w_pad, counts_val=cval,
                )
                (t_out, ar_i, ag_i, ab_i, w_next,
                 nox, noy, noz, ndx, ndy, ndz) = _level_math(
                    acc, rays6, w, best_t, hit, is_sphere, is_wall, is_box,
                    pt_lights, sun_lights, sky_s,
                    n_w=n_w, n_b=n_b, is_last=is_last,
                )
                ar, ag, ab = acc3
                return (
                    (nox, noy, noz, ndx, ndy, ndz), w_next,
                    (ar + ar_i, ag + ag_i, ab + ab_i), t_out, best_i,
                )

            def skip_level(op):
                rays6, w, acc3 = op
                # Identical to a dead tile through the per-level path: no
                # hits (t = fold MISS, i = -1), zero acc increment, rays
                # pass through, throughput stays dead.
                return rays6, w, acc3, miss_t, miss_i

            rays6, w, acc3, t_k, i_k = jax.lax.cond(
                jnp.any(w > 0.0), run_level, skip_level, (rays6, w, acc3)
            )
            out_refs[3 + 2 * k][:] = t_k
            out_refs[4 + 2 * k][:] = i_k

        out_refs[0][:] = acc3[0]
        out_refs[1][:] = acc3[1]
        out_refs[2][:] = acc3[2]

    return kernel


@_jit_cfg(static_argnames=("n_w", "n_b", "wall_base", "box_base", "n_chunks",
                     "n_s_pad", "n_w_pad", "n_pt", "n_sun", "depth", "sl_r",
                     "emit_res", "interpret"))
def _trace_whole(tables, gtables, slab, mats, lights, sky, rays, *,
                 n_w: int, n_b: int, wall_base: int, box_base: int,
                 n_chunks: int, n_s_pad: int, n_w_pad: int, n_pt: int,
                 n_sun: int, depth: int, sl_r: int, emit_res: bool = False,
                 interpret: bool):
    h, w = rays[0].shape
    grid = (h // sl_r, w // _SL_C)
    spec = pl.BlockSpec(
        (sl_r, _SL_C), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
    )
    n_out = 3 + 2 * (depth + 1) + (7 * depth if emit_res else 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=25 + 17 + 9 + 13,
        grid=grid,
        in_specs=[spec] * 7,
        out_specs=(spec,) * n_out,
    )
    f32 = _out_struct((h, w), jnp.float32, rays[0])
    i32 = _out_struct((h, w), jnp.int32, rays[0])
    return pl.pallas_call(
        _kernel_trace_whole(n_w, n_b, wall_base, box_base, n_chunks,
                            n_s_pad, n_w_pad, n_pt, n_sun, depth, emit_res),
        out_shape=(f32, f32, f32) + (f32, i32) * (depth + 1)
        + ((f32,) * 6 + (f32,)) * (depth if emit_res else 0),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*tables, *gtables, slab, *mats, *lights, sky, *rays)


@functools.lru_cache(maxsize=None)
def _patch_morton_perm(ph: int, pw: int):
    """(perm, inv): np.int32 permutations taking row-major patch ids to
    Z-order over the (ph, pw) patch grid and back. Z-order makes groups
    of 4 consecutive patches (one kernel tile) mostly 2x2 squares."""
    import numpy as np

    def morton(r, c):
        m = 0
        for b in range(16):
            m |= ((c >> b) & 1) << (2 * b) | ((r >> b) & 1) << (2 * b + 1)
        return m

    keys = sorted(
        (morton(r, c), r * pw + c) for r in range(ph) for c in range(pw)
    )
    perm = np.fromiter((i for _, i in keys), dtype=np.int32, count=ph * pw)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(ph * pw, dtype=np.int32)
    return perm, inv


def _to_patch_major(x, ph: int, pw: int, perm, n_pad: int):
    """[ph*32, pw*32] plane -> [(ph*pw + n_pad) * 8, 128] patch-major."""
    p = x.reshape(ph, _PATCH, pw, _PATCH).transpose(0, 2, 1, 3)
    p = p.reshape(ph * pw, _PATCH * _PATCH)
    p = jnp.take(p, perm, axis=0)
    if n_pad:
        p = jnp.concatenate(
            [p, jnp.zeros((n_pad, _PATCH * _PATCH), x.dtype)]
        )
    return p.reshape(-1, _SL_C)


def _from_patch_major(x, ph: int, pw: int, inv, n_pad: int):
    """Inverse of `_to_patch_major` (pads stripped)."""
    p = x.reshape(-1, _PATCH * _PATCH)[: ph * pw]
    p = jnp.take(p, inv, axis=0)
    p = p.reshape(ph, pw, _PATCH, _PATCH).transpose(0, 2, 1, 3)
    return p.reshape(ph * _PATCH, pw * _PATCH)


def _light_sky_tables(scene: Scene):
    """Light + sky scalar tables (pre-unit sun directions, shade_soa parity).

    Differentiable in the scene's light/sky leaves — the backward
    orchestrator re-derives them under ``jax.vjp`` so light/sky gradients
    (including through the sun normalization) flow from the kernels'
    scalar cotangents back to the scene pytree.
    """
    lights = scene.lights
    n_pt = lights.point_position.shape[0]
    n_sun = lights.sun_color.shape[0]

    def col3(a, k, n):
        return a[:, k] if n else jnp.zeros((1,), jnp.float32)

    lp, lc = lights.point_position, lights.point_color
    sun_d = lights.sun_direction
    if n_sun:
        sun_d = sun_d * jax.lax.rsqrt(
            jnp.sum(sun_d * sun_d, axis=-1, keepdims=True)
        )
    sc = lights.sun_color
    light_tbls = (
        col3(lp, 0, n_pt), col3(lp, 1, n_pt), col3(lp, 2, n_pt),
        col3(lc, 0, n_pt), col3(lc, 1, n_pt), col3(lc, 2, n_pt),
        col3(sun_d, 0, n_sun), col3(sun_d, 1, n_sun), col3(sun_d, 2, n_sun),
        col3(sc, 0, n_sun), col3(sc, 1, n_sun), col3(sc, 2, n_sun),
    )
    sky = scene.sky
    sky_tbl = jnp.concatenate([
        jnp.asarray(sky.horizon_color, jnp.float32),
        jnp.asarray(sky.zenith_color, jnp.float32),
        jnp.asarray(sky.ground_color, jnp.float32),
        jnp.asarray(sky.gradient_exponent, jnp.float32).reshape(1),
    ])
    return light_tbls, sky_tbl, n_pt, n_sun


def _to_rows(x, hp: int, wp: int):
    """[hp, wp] plane -> [hp * wp/128, 128] rows of adjacent pixels.

    Pure reshape: row ``i * wp/128 + j`` is image row ``i``, pixel columns
    ``[j*128, (j+1)*128)`` — consecutive rows start out spatially adjacent,
    so the stable sort preserves locality within equal keys."""
    return x.reshape(hp, wp // _SL_C, _SL_C).reshape(-1, _SL_C)


def _from_rows(x, hp: int, wp: int):
    """Inverse of `_to_rows`."""
    return x.reshape(hp, wp // _SL_C, _SL_C).reshape(hp, wp)


def _row_sort_order(i_prev, rays6, w, n_chunks: int, wall_base: int):
    """[n_rows] i32 permutation grouping coherent rows (see `_ROW_SORT`).

    Key per row of 128 rays: (majority winner CHUNK among the row's
    sphere-hitting lanes, reflected-direction bin), wall-only rows in one
    trailing chunk bucket (their origins spread over the wall; direction is
    the only usable key), fully-dead rows last (they compact into dead
    tiles the kernel cond-skips whole levels for). Everything here is
    selection data — gradients never flow through the permutation."""
    sg = jax.lax.stop_gradient
    i_prev, w = sg(i_prev), sg(w)
    dx, dy, dz = sg(rays6[3]), sg(rays6[4]), sg(rays6[5])
    live = w > 0.0
    is_s = (i_prev >= 0) & (i_prev < wall_base) & live
    ch = jnp.where(is_s, i_prev // _unroll(), n_chunks)
    cnt = jnp.stack(
        [jnp.sum(ch == c, axis=1, dtype=jnp.int32) for c in range(n_chunks)],
        axis=1,
    )
    maj = jnp.argmax(cnt, axis=1).astype(jnp.int32)
    has_s = jnp.max(cnt, axis=1) > 0
    # Direction bin: sign(x) x angle-in-(y,z) of the row's mean live
    # direction (the camera axis is x for every stock scene; for arbitrary
    # scenes this is still a valid — merely unoptimized — coherence key).
    bins = max(_SORT_DIR_BINS, 1)
    if bins > 1:
        half = max(bins // 2, 1)
        my = jnp.sum(jnp.where(live, dy, 0.0), axis=1)
        mz = jnp.sum(jnp.where(live, dz, 0.0), axis=1)
        mx = jnp.sum(jnp.where(live, dx, 0.0), axis=1)
        ang = jnp.arctan2(mz, my)
        ang_b = jnp.clip(
            ((ang + jnp.pi) * (half / (2.0 * jnp.pi))).astype(jnp.int32),
            0, half - 1,
        )
        dirb = jnp.where(mx > 0.0, half, 0) + ang_b
    else:
        dirb = jnp.zeros_like(maj)
    row_live = jnp.any(live, axis=1)
    key = jnp.where(has_s, maj, n_chunks) * bins + dirb
    key = jnp.where(row_live, key, jnp.int32(1 << 30))
    return jnp.argsort(key)  # stable: ties keep spatial order


def _trace_levels_pallas_impl(
    scene: Scene, o: V3, d: V3, *, depth: int,
    interpret: bool | None = None,
    with_residuals: bool = False,
):
    """The whole depth-N trace as a chain of per-level megakernels.

    Per level: XLA builds the per-tile chunk shortlist (phase A) from the
    previous level's rays/throughput, then ONE kernel folds, regathers,
    shades, accumulates, and reflects. Returns ``(acc_rgb V3, per-level
    (t, index) lists)`` — the selections feed the whole-trace custom VJP
    in trace.py. Selection-only + formula-mirrored, so forward values
    match the per-level XLA pipeline to f32 fusion tolerance.

    Bounce levels (k >= 1) may use a FINER row tile (``_SL_R_BOUNCE``):
    divergent reflected rays regain spatial coherence in smaller tiles, so
    their reach boxes — and therefore their chunk shortlists and tube
    gates — tighten. Re-tiling per level only costs one `_ray_stats`
    kernel (~0.3 ms at 1080p); the level kernels themselves are
    tile-shape-agnostic over the same padded arrays.
    """
    if interpret is None:
        interpret = not pallas_available()
    # Level-0 row tile, scene-adaptive: large (multi-chunk) scenes use the
    # bounce-tile height so EVERY level keeps one tiling and the free
    # prev-kernel stats hand-off replaces the per-level `_ray_stats` +
    # XLA phase-A re-tiling (measured v5e 2026-08-20: grid-1024 1080p d3
    # 48.5 -> 47.7 ms, c5 4K d4 208.8 -> 204.7); small scenes keep the
    # 64-row tile (the fused/demo class loses with 32: c3 4.24 -> 4.40).
    n_s_est = len(scene.spheres)
    n_chunks_est = -(-n_s_est // _unroll()) if n_s_est else 0
    sl_r = _check_sl_r(
        _SL_R_BOUNCE if n_chunks_est >= _SL_R_MATCH_MIN_CHUNKS else _SL_R
    )
    sl_rb = _check_sl_r(_SL_R_BOUNCE)
    if sl_r % sl_rb != 0 and sl_rb % sl_r != 0:
        raise ValueError(
            f"RT_SL_R_BOUNCE={sl_rb} must divide (or be a multiple of) "
            f"the level-0 row tile {sl_r}"
        )
    shape = jnp.broadcast_shapes(o.x.shape, d.x.shape)
    h, w = shape
    hp = -(-h // sl_r) * sl_r
    wp = -(-w // _SL_C) * _SL_C

    def prep(c, fill):
        c = jnp.broadcast_to(c, shape)
        if hp != h or wp != w:
            c = jnp.pad(c, ((0, hp - h), (0, wp - w)), constant_values=fill)
        return c

    rays = (
        prep(o.x, 0.0), prep(o.y, 0.0), prep(o.z, 0.0),
        prep(d.x, 0.0), prep(d.y, 0.0), prep(d.z, 1.0),
    )
    # Pad lanes carry zero throughput: they never contribute and phase A's
    # reach statistics ignore them.
    w_live = jnp.ones((h, w), jnp.float32)
    if hp != h or wp != w:
        w_live = jnp.pad(w_live, ((0, hp - h), (0, wp - w)))
    zero = jnp.zeros((hp, wp), jnp.float32)
    state = (w_live, zero, zero, zero)

    tables, counts_tbl = _packed_fold_tables(scene)
    srad, mats, n_s_pad, n_w_pad = _packed_mat_tables(scene, counts_tbl)
    th, tw = hp // sl_r, wp // _SL_C
    n_chunks = counts_tbl["n_s_pad"] // _unroll() if counts_tbl["n_s_pad"] else 0

    light_tbls, sky_tbl, n_pt, n_sun = _light_sky_tables(scene)

    if n_chunks:
        c_lo, c_hi, gtables_s, gr_s, slab_s = _chunk_culling_tables(
            scene, n_chunks
        )

    # Patch-major bounce layout (see `_PATCH_MAJOR`): bounce levels run on
    # re-layouted planes where each kernel tile is a ~64x64-pixel square.
    # Forward-only for now: the backward consumes the forward's saved
    # per-tile shortlists, which would need the same relayout plumbing.
    pm = (
        _PATCH_MAJOR and not with_residuals and depth > 0 and n_chunks > 1
        and hp % _PATCH == 0 and wp % _PATCH == 0 and sl_rb == _PATCH
        and _SLICES == 1
    )
    if pm:
        ph_p, pw_p = hp // _PATCH, wp // _PATCH
        pm_pad = (-(ph_p * pw_p)) % 4
        pm_perm, pm_inv = _patch_morton_perm(ph_p, pw_p)

        def to_pm(x):
            return _to_patch_major(x, ph_p, pw_p, pm_perm, pm_pad)

        def from_pm(x):
            return _from_patch_major(x, ph_p, pw_p, pm_inv, pm_pad)

    # Fused whole-trace kernel for identity-shortlist scenes (see
    # _FUSED_MAX_CHUNKS): every level in one kernel, zero inter-level HBM.
    # With residuals it additionally streams out each bounce level's input
    # rays/throughput so the TRAINING forward runs fused too — the backward
    # trace kernels consume these with identity per-tile shortlists.
    if (
        1 <= depth <= _FUSED_MAX_DEPTH
        and _SLICES == 1 and not pm and 0 < n_chunks <= _FUSED_MAX_CHUNKS
        and (not with_residuals or _FUSED_RESID)
    ):
        outs = _trace_whole(
            tables, gtables_s, slab_s, (srad,) + mats, light_tbls, sky_tbl,
            rays + (w_live,),
            n_w=counts_tbl["n_w"], n_b=counts_tbl["n_b"],
            wall_base=counts_tbl["n_s"],
            box_base=counts_tbl["n_s"] + counts_tbl["n_w"],
            n_chunks=n_chunks, n_s_pad=n_s_pad, n_w_pad=n_w_pad,
            n_pt=n_pt, n_sun=n_sun, depth=depth, sl_r=sl_r,
            emit_res=with_residuals, interpret=interpret,
            cfg=_cfg_key(),
        )

        if with_residuals:
            # Backward consumes the PADDED planes + per-level shortlists;
            # the fused fold walked the identity chunk list, so the
            # residual shortlists are identity lists over every tile.
            ar, ag, ab = outs[0:3]
            ts = [outs[3 + 2 * k] for k in range(depth + 1)]
            idxs = [outs[4 + 2 * k] for k in range(depth + 1)]
            res0 = 3 + 2 * (depth + 1)
            rays_levels = [rays] + [
                tuple(outs[res0 + 7 * (k - 1) + j] for j in range(6))
                for k in range(1, depth + 1)
            ]
            w_levels = [w_live] + [
                outs[res0 + 7 * (k - 1) + 6] for k in range(1, depth + 1)
            ]
            th, tw = hp // sl_r, wp // _SL_C
            chunk_list = jnp.broadcast_to(
                jnp.arange(n_chunks, dtype=jnp.int32),
                (th * tw * _SLICES, n_chunks),
            ).reshape(-1)
            # Dead (sky) tiles keep their -1 skip marker in the residual
            # shortlists (ADVICE r4): derive per-level counts from each
            # level's throughput plane so a per-level backward (RT_FUSED_BWD
            # =0) skips them; the fused backward gates on the w plane
            # directly and ignores these counts.
            sl_levels = [
                (
                    chunk_list,
                    jnp.where(
                        _slice_reduce(w_k > 0.0, th, tw, jnp.any, sl_r),
                        n_chunks, -1,
                    ).astype(jnp.int32).reshape(-1),
                    sl_r,
                )
                for w_k in w_levels
            ]
            acc = V3(
                ar[:h, :w], ag[:h, :w], ab[:h, :w]
            ) if (hp != h or wp != w) else V3(ar, ag, ab)
            return acc, ts, idxs, rays_levels, w_levels, sl_levels

        def crop(x):
            return x[:h, :w] if (hp != h or wp != w) else x

        ar, ag, ab = (crop(c) for c in outs[0:3])
        ts = [crop(outs[3 + 2 * k]) for k in range(depth + 1)]
        idxs = [crop(outs[4 + 2 * k]) for k in range(depth + 1)]
        return V3(ar, ag, ab), ts, idxs

    # Row-sorted bounce traversal (see `_ROW_SORT` above). Forward-only:
    # the backward consumes the forward's saved per-level shortlists and
    # would need per-level permutation plumbing.
    rs = (
        _ROW_SORT and not with_residuals and depth > 0 and not pm
        and _SLICES == 1 and n_chunks >= _ROW_SORT_MIN_CHUNKS
        and (hp * (wp // _SL_C)) % _check_sl_r(_SORT_R) == 0
    )
    cur_pos = None  # sorted position -> original row id
    i_prev_cur = None  # previous level's winner-index plane, current layout

    ts, idxs = [], []
    rays_levels, w_levels, sl_levels = [], [], []  # per-level residuals
    prev_stats = None
    for k in range(depth + 1):
        sl_k = sl_r if k == 0 else (_SORT_R if rs else sl_rb)
        if rs and k >= 1:
            if k == 1:
                rays = tuple(_to_rows(c, hp, wp) for c in rays)
                state = tuple(_to_rows(c, hp, wp) for c in state)
                i_prev_cur = _to_rows(i_prev_cur, hp, wp)
                cur_pos = jnp.arange(rays[0].shape[0], dtype=jnp.int32)
            order = _row_sort_order(
                i_prev_cur, rays, state[0], n_chunks,
                wall_base=counts_tbl["n_s"],
            )
            rays = tuple(jnp.take(c, order, axis=0) for c in rays)
            state = tuple(jnp.take(c, order, axis=0) for c in state)
            cur_pos = jnp.take(cur_pos, order)
        if pm and k == 1:
            rays = tuple(to_pm(c) for c in rays)
            state = tuple(to_pm(c) for c in state)
        th_k = rays[0].shape[0] // sl_k
        tw_k = rays[0].shape[1] // _SL_C
        if with_residuals:
            rays_levels.append(rays)
            w_levels.append(state[0])
        if n_chunks == 0:
            act = state[0] > 0.0
            alive = _slice_reduce(act, th_k, tw_k, jnp.any, sl_k)
            counts = jnp.where(alive, 0, -1).astype(jnp.int32).reshape(-1)
            n_chunks_eff = 1
            chunk_list = jnp.zeros((th_k * tw_k * _SLICES,), jnp.int32)
            gtables = _dummy_gtables()
            slab = jnp.zeros((8,), jnp.float32)
        elif k > 0 and not rs and _PHASE_A_BOUNCE and (
            sl_rb == sl_r if not pm else k >= 2
        ):
            # Bounce shortlists from the PREVIOUS kernel's tile stats — the
            # per-ray half of phase A already ran in VMEM; XLA only does the
            # [tiles x chunks] overlap test + near-to-far sort. Only valid
            # when this level keeps the previous level's tiling.
            stats = _stats_to_phase_a(prev_stats)
            with_reach = (
                _TUBE_SHORTLIST and n_chunks <= _chunk_reach_capacity()
            )
            chunk_list, counts = _phase_a_from_stats(
                c_lo, c_hi, gtables_s, gr_s, stats, n_chunks,
                chunk_reach=(
                    _stats_to_chunk_reach(prev_stats, n_chunks)
                    if with_reach else None
                ),
            )
            gtables, slab = gtables_s, slab_s
            n_chunks_eff = n_chunks
        else:
            act = state[0] > 0.0
            chunk_list, counts, gtables, slab = _shortlist_phase_a(
                scene, rays, act, th_k, tw_k, n_chunks, sl_k,
                per_tile=(k == 0) or _PHASE_A_BOUNCE,
                interpret=interpret,
            )
            n_chunks_eff = n_chunks
        if with_residuals:
            sl_levels.append((chunk_list, counts, sl_k))
        outs = _trace_level(
            tables, chunk_list, counts, gtables, slab, (srad,) + mats,
            light_tbls, sky_tbl, rays, state,
            n_w=counts_tbl["n_w"], n_b=counts_tbl["n_b"],
            wall_base=counts_tbl["n_s"],
            box_base=counts_tbl["n_s"] + counts_tbl["n_w"],
            tiles_w=tw_k, n_chunks=n_chunks_eff, n_s_pad=n_s_pad,
            n_w_pad=n_w_pad, n_pt=n_pt, n_sun=n_sun,
            is_last=(k == depth), sl_r=sl_k,
            emit_stats=(
                (k < depth) and not rs and _PHASE_A_BOUNCE and n_chunks > 0
                and (sl_rb == sl_r if not pm else k >= 1)
            ),
            interpret=interpret,
            cfg=_cfg_key(),
        )
        t_k, i_k, ar, ag, ab, w_k = outs[:6]
        rays = tuple(outs[6:12])
        prev_stats = outs[12]
        state = (w_k, ar, ag, ab)
        i_prev_cur = i_k
        if with_residuals:
            ts.append(t_k)  # backward kernels consume the PADDED planes
            idxs.append(i_k)
        else:
            if pm and k >= 1:
                t_k, i_k = from_pm(t_k), from_pm(i_k)
            if rs and k >= 1:
                inv = jnp.argsort(cur_pos)
                t_k = _from_rows(jnp.take(t_k, inv, axis=0), hp, wp)
                i_k = _from_rows(jnp.take(i_k, inv, axis=0), hp, wp)
            ts.append(t_k[:h, :w] if (hp != h or wp != w) else t_k)
            idxs.append(i_k[:h, :w] if (hp != h or wp != w) else i_k)

    _, ar, ag, ab = state
    if pm and depth > 0:
        ar, ag, ab = from_pm(ar), from_pm(ag), from_pm(ab)
    if rs and depth > 0:
        inv = jnp.argsort(cur_pos)
        ar, ag, ab = (
            _from_rows(jnp.take(c, inv, axis=0), hp, wp)
            for c in (ar, ag, ab)
        )
    if hp != h or wp != w:
        ar, ag, ab = ar[:h, :w], ag[:h, :w], ab[:h, :w]
    if with_residuals:
        return V3(ar, ag, ab), ts, idxs, rays_levels, w_levels, sl_levels
    return V3(ar, ag, ab), ts, idxs


# ---------------------------------------------------------------------------
# Backward trace megakernel (the training path's reverse sweep).
#
# The forward saves, per level, its INPUT rays/throughput and its (t, index)
# selections — all existing inter-kernel HBM arrays, so the forward costs
# nothing extra. The backward then runs one kernel per level in REVERSE
# order: winner attributes are re-gathered in XLA by the differentiable
# one-hot matmul (trace.py `_onehot_matmul_gather`, whose vjp is the MXU
# scatter into the parameter table), and the kernel `jax.vjp`s the SAME
# `_level_math` the forward executed — entirely in VMEM, with zero forward
# replay and zero HBM residual traffic. Light/sky scalar cotangents reduce
# in-kernel to one stats row per tile.
# ---------------------------------------------------------------------------


def _kernel_trace_level_bwd(n_w: int, n_b: int, wall_base: int,
                            box_base: int, n_chunks: int, n_s_pad: int,
                            n_w_pad: int, n_b_pad: int, tiles_w: int,
                            n_pt: int, n_sun: int, is_last: bool):
    """Backward of one trace level, fully in VMEM.

    Regathers the winner attributes from the SMEM tables (same
    `_regather_core` as the forward — no HBM attribute planes), `jax.vjp`s
    the exact `_level_math` the forward executed, and SCATTERS the
    attribute cotangents into a per-tile [n_rows, 16] gradient block by
    walking the same winner chunks. This keeps the whole parameter
    gradient off the one-hot-matmul path, whose staged [rays, prims]
    one-hot buffers dominated the XLA backward (measured: 8.05 GB /
    31.7 GFLOP for grid-64 1080p d3, ~4.3 GB of it one-hot staging).
    Gradient-block row layout matches `_packed_mat_tables`: spheres at
    [0, n_s_pad), walls, then boxes; columns 0-13 follow the regather
    ``acc`` order (geometry g0..g5, then the 8 material columns).
    """

    n_rows_tot = n_s_pad + n_w_pad + n_b_pad

    def kernel(
        # scalar-prefetch: geometry/material tables (as the hit kernel) +
        # per-level shortlists + light/sky tables
        cx, cy, cz, cr2,
        nx, ny, nz, dpl, rx, ry, rz, ux, uy, uz, px, py, pz, ln, wd,
        bmnx, bmny, bmnz, bmxx, bmxy, bmxz,
        chunk_list, counts,
        srad, mcr, mcg, mcb, mam, mmt, mdf, msp, mex,
        lpx, lpy, lpz, lcr, lcg, lcb,
        sdx, sdy, sdz, scr, scg, scb,
        sky,
        # VMEM: level inputs (saved residuals)
        ox, oy, oz, dx, dy, dz, w_in, t_in, i_in,
        # VMEM: cotangents of the level's outputs
        car, cag, cab,  # d acc increment (= d final image, acc is linear)
        cnox, cnoy, cnoz, cndx, cndy, cndz, cwn,  # d next rays / throughput
        # outputs: cotangents of the level's inputs
        cox_ref, coy_ref, coz_ref, cdx_ref, cdy_ref, cdz_ref, cw_ref,
        pg_ref,  # [1, 1, n_rows_tot, 16] per-tile parameter-gradient block
        ls_ref,  # light/sky scalar cotangents, one stats row per tile
    ):
        sm = dict(
            cx=cx, cy=cy, cz=cz, nx=nx, ny=ny, nz=nz,
            px=px, py=py, pz=pz, bmnx=bmnx, bmny=bmny, bmnz=bmnz,
            bmxx=bmxx, bmxy=bmxy, bmxz=bmxz,
            chunk_list=chunk_list, counts=counts, srad=srad,
            mcr=mcr, mcg=mcg, mcb=mcb, mam=mam, mmt=mmt, mdf=mdf,
            msp=msp, mex=mex,
        )
        t_id = pl.program_id(0) * tiles_w + pl.program_id(1)
        rays = (ox[:], oy[:], oz[:], dx[:], dy[:], dz[:])
        w = w_in[:]
        t_sel = t_in[:]
        i_sel = i_in[:]
        alive = counts[t_id * _SLICES] >= 0
        for s_i in range(1, _SLICES):
            alive = alive | (counts[t_id * _SLICES + s_i] >= 0)
        # t_sel = the forward's where(hit, tt, fold_t): tt is finite and
        # fold misses are MISS_T, so hit is recoverable from t_sel alone;
        # _regather_core derives the same masks from (t_sel, i_sel).
        acc, hit, is_sphere, is_wall, is_box = _regather_core(
            sm, t_id, t_sel, i_sel, alive,
            n_w=n_w, n_b=n_b, wall_base=wall_base, box_base=box_base,
            n_chunks=n_chunks, n_s_pad=n_s_pad, n_w_pad=n_w_pad,
        )
        pt = tuple(
            (lpx[li], lpy[li], lpz[li], lcr[li], lcg[li], lcb[li])
            for li in range(n_pt)
        )
        sun = tuple(
            (sdx[si], sdy[si], sdz[si], scr[si], scg[si], scb[si])
            for si in range(n_sun)
        )
        sky_s = tuple(sky[i] for i in range(10))

        def f(a_t, rays_t, w_t, pt_t, sun_t, sky_t):
            (t_out, ar_inc, ag_inc, ab_inc, w_next,
             nox, noy, noz, ndx, ndy, ndz) = _level_math(
                a_t, rays_t, w_t, t_sel, hit, is_sphere, is_wall, is_box,
                pt_t, sun_t, sky_t, n_w=n_w, n_b=n_b, is_last=is_last,
            )
            return (ar_inc, ag_inc, ab_inc, w_next,
                    nox, noy, noz, ndx, ndy, ndz)

        _, vjp = jax.vjp(f, acc, rays, w, pt, sun, sky_s)
        cts = (car[:], cag[:], cab[:], cwn[:],
               cnox[:], cnoy[:], cnoz[:], cndx[:], cndy[:], cndz[:])
        ct_a, ct_rays, ct_w, ct_pt, ct_sun, ct_sky = vjp(cts)

        for ref, v in zip(
            (cox_ref, coy_ref, coz_ref, cdx_ref, cdy_ref, cdz_ref), ct_rays
        ):
            ref[:] = v
        cw_ref[:] = ct_w

        # --- in-kernel parameter scatter: the transpose of the regather.
        # ct_a is nonzero only at winner lanes; sum it per winning
        # primitive into the per-tile gradient block, walking the SAME
        # chunk shortlist (cond-gated on winners) so the cost scales with
        # winner chunks, not scene size.
        pg_ref[0, 0] = jnp.zeros((n_rows_tot, 16), jnp.float32)
        lane16 = jax.lax.broadcasted_iota(jnp.int32, (1, 16), 1)

        def row_vals(vals14):
            row = jnp.zeros((1, 16), jnp.float32)
            for c, v in enumerate(vals14):
                row = jnp.where(lane16 == c, v, row)
            return row

        rows_t = t_sel.shape[0]
        rows_g = max(rows_t // _SLICES, 1)

        def make_scatter(s_i):
            sl = slice(s_i * rows_g, (s_i + 1) * rows_g)
            is_sphere_s, i_sel_s = is_sphere[sl], i_sel[sl]
            ct_a_s = tuple(c[sl] for c in ct_a)
            list_base = (t_id * _SLICES + s_i) * n_chunks

            def scatter_chunk(k, carry):
                c = sm["chunk_list"][list_base + k]
                base = c * _unroll()
                in_chunk = (
                    is_sphere_s & (i_sel_s >= base)
                    & (i_sel_s < base + _unroll())
                )

                @pl.when(jnp.any(in_chunk))
                def _():
                    for u in range(_unroll()):
                        idx = base + u
                        m = is_sphere_s & (i_sel_s == idx)
                        mf = m.astype(jnp.float32)
                        # sphere rows use ct_a cols (g0..g3 = center xyz +
                        # radius; g4/g5 unused) + the 8 material columns
                        sums = [jnp.sum(mf * ct_a_s[cc]) for cc in
                                (0, 1, 2, 3)] + [jnp.float32(0.0)] * 2 + [
                            jnp.sum(mf * ct_a_s[cc]) for cc in range(6, 14)
                        ]
                        cur = pg_ref[0, 0, pl.dslice(idx, 1), :]
                        pg_ref[0, 0, pl.dslice(idx, 1), :] = (
                            cur + row_vals(sums)
                        )

                return carry

            return scatter_chunk

        if n_chunks and wall_base:
            for s_i in range(_SLICES):
                n_g = sm["counts"][t_id * _SLICES + s_i]
                jax.lax.fori_loop(
                    0, jnp.maximum(n_g, 0), make_scatter(s_i), 0
                )

        def scatter_flat(i, row0, mask_type):
            m = mask_type & (i_sel == i + (wall_base if row0 == n_s_pad
                                           else box_base))
            mf = m.astype(jnp.float32)
            sums = [jnp.sum(mf * ct_a[cc]) for cc in range(14)]
            cur = pg_ref[0, 0, pl.dslice(row0 + i, 1), :]
            pg_ref[0, 0, pl.dslice(row0 + i, 1), :] = cur + row_vals(sums)
            return 0

        if n_w:
            jax.lax.fori_loop(
                0, jnp.where(alive, n_w, 0),
                lambda i, cr: scatter_flat(i, n_s_pad, is_wall), 0,
            )
        if n_b:
            jax.lax.fori_loop(
                0, jnp.where(alive, n_b, 0),
                lambda i, cr: scatter_flat(i, n_s_pad + n_w_pad, is_box), 0,
            )

        # Pack the light/sky scalar cotangents (already tile-reduced by the
        # vjp) into one (8, _SL_C) stats row: point lights first (6 each),
        # then suns (6 each), then the 10 sky scalars.
        vals = []
        for li in range(n_pt):
            vals.extend(ct_pt[li])
        for si in range(n_sun):
            vals.extend(ct_sun[si])
        vals.extend(ct_sky)
        srow = jnp.zeros((8, _SL_C), jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, (8, _SL_C), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, _SL_C), 1)
        for idx, v in enumerate(vals):
            srow = jnp.where(
                (row == idx // _SL_C) & (lane == idx % _SL_C), v, srow
            )
        ls_ref[0, 0] = srow

    return kernel


@_jit_cfg(static_argnames=("n_w", "n_b", "wall_base", "box_base", "n_chunks",
                     "n_s_pad", "n_w_pad", "n_b_pad", "n_pt", "n_sun",
                     "is_last", "sl_r", "interpret"))
def _trace_level_bwd(tables, chunk_list, counts, mats, lights, sky,
                     level_in, ct_acc, ct_next, *,
                     n_w: int, n_b: int, wall_base: int, box_base: int,
                     n_chunks: int, n_s_pad: int, n_w_pad: int,
                     n_b_pad: int, n_pt: int, n_sun: int, is_last: bool,
                     sl_r: int, interpret: bool):
    """One backward trace level.

    Returns ``(ct_o3, ct_d3, ct_w, param_grad_tiles, ls_stats)`` where
    ``param_grad_tiles`` is [th, tw, n_rows, 16] (summed over tiles by the
    caller). ``level_in``: the level's saved (o3, d3, w, t, i); ``ct_acc``:
    the final image cotangent (3 planes); ``ct_next``: cotangent of the
    level's outputs (next o3, d3, w) — zeros for the last level.
    """
    h, w = level_in[0].shape
    grid = (h // sl_r, w // _SL_C)
    th, tw = grid
    n_rows_tot = n_s_pad + n_w_pad + n_b_pad
    spec = pl.BlockSpec(
        (sl_r, _SL_C), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
    )
    stats_spec = pl.BlockSpec(
        (1, 1, 8, _SL_C), lambda i, j, *_: (i, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    pg_spec = pl.BlockSpec(
        (1, 1, n_rows_tot, 16), lambda i, j, *_: (i, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=25 + 2 + 9 + 13,
        grid=grid,
        in_specs=[spec] * 19,
        out_specs=(spec,) * 7 + (pg_spec, stats_spec),
    )
    f32 = _out_struct((h, w), jnp.float32, level_in[0])
    return pl.pallas_call(
        _kernel_trace_level_bwd(n_w, n_b, wall_base, box_base, n_chunks,
                                n_s_pad, n_w_pad, n_b_pad, tw, n_pt, n_sun,
                                is_last),
        out_shape=(f32,) * 7
        + (_out_struct((th, tw, n_rows_tot, 16), jnp.float32, level_in[0]),
           _out_struct((th, tw, 8, _SL_C), jnp.float32, level_in[0])),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*tables, chunk_list, counts, *mats, *lights, sky,
      *level_in, *ct_acc, *ct_next)


# Fused whole-trace BACKWARD (VERDICT r4 item 1): for the same scene class
# the forward fuses (<= _FUSED_MAX_CHUNKS chunks, identity shortlists), run
# the entire reverse sweep in ONE kernel — per-level ray/throughput
# cotangents chain in VMEM instead of round-tripping HBM between depth+1
# kernel dispatches, the parameter-gradient block accumulates across levels
# in one per-tile output, and dead (sky) tiles lax.cond-skip whole backward
# levels exactly like the forward's skip_level.
_FUSED_BWD = os.environ.get("RT_FUSED_BWD", "1") != "0"


def _kernel_trace_whole_bwd(n_w: int, n_b: int, wall_base: int,
                            box_base: int, n_chunks: int, n_s_pad: int,
                            n_w_pad: int, n_b_pad: int, n_pt: int,
                            n_sun: int, depth: int):
    """All backward trace levels in one kernel.

    Inputs: per level k = 0..depth the saved residuals (input rays6,
    throughput w, selections t/i — 9 planes each), then the image
    cotangent (3 planes). The reverse sweep runs in-register: level k's
    input-ray/throughput cotangents feed level k-1 without touching HBM.
    Identity chunk shortlists (this kernel serves only the fused-forward
    scene class); per-level tile aliveness comes from the saved throughput
    plane, so fully-dead (sky) tiles skip the regather + vjp of every dead
    level (the fix for ADVICE r4's dead-tile note on fused residuals).
    """
    n_rows_tot = n_s_pad + n_w_pad + n_b_pad
    n_ls = n_pt * 6 + n_sun * 6 + 10

    def kernel(
        cx, cy, cz, cr2,
        nx, ny, nz, dpl, rx, ry, rz, ux, uy, uz, px, py, pz, ln, wd,
        bmnx, bmny, bmnz, bmxx, bmxy, bmxz,
        srad, mcr, mcg, mcb, mam, mmt, mdf, msp, mex,
        lpx, lpy, lpz, lcr, lcg, lcb,
        sdx, sdy, sdz, scr, scg, scb,
        sky,
        *refs,
    ):
        n_in = 9 * (depth + 1) + 3
        ins = refs[:n_in]
        (cox_ref, coy_ref, coz_ref, cdx_ref, cdy_ref, cdz_ref, cw_ref,
         pg_ref, ls_ref) = refs[n_in:]
        sm = dict(
            cx=cx, cy=cy, cz=cz, nx=nx, ny=ny, nz=nz,
            px=px, py=py, pz=pz, bmnx=bmnx, bmny=bmny, bmnz=bmnz,
            bmxx=bmxx, bmxy=bmxy, bmxz=bmxz,
            chunk_list=None, counts=None, srad=srad,
            mcr=mcr, mcg=mcg, mcb=mcb, mam=mam, mmt=mmt, mdf=mdf,
            msp=msp, mex=mex,
        )
        pt = tuple(
            (lpx[li], lpy[li], lpz[li], lcr[li], lcg[li], lcb[li])
            for li in range(n_pt)
        )
        sun = tuple(
            (sdx[si], sdy[si], sdz[si], scr[si], scg[si], scb[si])
            for si in range(n_sun)
        )
        sky_s = tuple(sky[i] for i in range(10))
        car, cag, cab = (ins[9 * (depth + 1) + j][:] for j in range(3))
        zero = jnp.zeros_like(car)
        ct7 = (zero,) * 7  # d(next o3, d3, w) — zeros after the last level
        pg_ref[0, 0] = jnp.zeros((n_rows_tot, 16), jnp.float32)
        ls_acc = [jnp.float32(0.0)] * n_ls
        lane16 = jax.lax.broadcasted_iota(jnp.int32, (1, 16), 1)

        def row_vals(vals14):
            row = jnp.zeros((1, 16), jnp.float32)
            for c, v in enumerate(vals14):
                row = jnp.where(lane16 == c, v, row)
            return row

        for k in reversed(range(depth + 1)):
            b = 9 * k
            rays = tuple(ins[b + j][:] for j in range(6))
            w = ins[b + 6][:]
            t_sel = ins[b + 7][:]
            i_sel = ins[b + 8][:]
            alive = jnp.any(w > 0.0)
            is_last = k == depth

            def run(ct7, rays=rays, w=w, t_sel=t_sel, i_sel=i_sel,
                    is_last=is_last):
                acc, hit, is_s, is_wl, is_bx = _regather_core(
                    sm, 0, t_sel, i_sel, True,
                    n_w=n_w, n_b=n_b, wall_base=wall_base,
                    box_base=box_base, n_chunks=n_chunks,
                    n_s_pad=n_s_pad, n_w_pad=n_w_pad,
                    counts_val=jnp.int32(n_chunks),
                )

                def f(a_t, rays_t, w_t, pt_t, sun_t, sky_t):
                    (t_out, ar_inc, ag_inc, ab_inc, w_next,
                     nox, noy, noz, ndx, ndy, ndz) = _level_math(
                        a_t, rays_t, w_t, t_sel, hit, is_s, is_wl, is_bx,
                        pt_t, sun_t, sky_t, n_w=n_w, n_b=n_b,
                        is_last=is_last,
                    )
                    return (ar_inc, ag_inc, ab_inc, w_next,
                            nox, noy, noz, ndx, ndy, ndz)

                _, vjp = jax.vjp(f, acc, rays, w, pt, sun, sky_s)
                cts = (car, cag, cab, ct7[6],
                       ct7[0], ct7[1], ct7[2], ct7[3], ct7[4], ct7[5])
                ct_a, ct_rays, ct_w, ct_pt, ct_sun, ct_sky = vjp(cts)
                ls_flat = []
                for li in range(n_pt):
                    ls_flat.extend(ct_pt[li])
                for si in range(n_sun):
                    ls_flat.extend(ct_sun[si])
                ls_flat.extend(ct_sky)
                return tuple(ct_rays) + (ct_w,) + tuple(ct_a) + tuple(ls_flat)

            def skip(ct7):
                # Dead level = forward skip_level: rays/throughput pass
                # through, so their cotangents pass through unchanged; no
                # attribute / light / sky contributions.
                return (
                    ct7 + (zero,) * 14
                    + (jnp.float32(0.0),) * n_ls
                )

            out = jax.lax.cond(alive, run, skip, ct7)
            ct7 = out[:7]
            ct_a = out[7:21]
            ls_acc = [a + v for a, v in zip(ls_acc, out[21:])]

            # --- parameter scatter into the per-tile gradient block, the
            # transpose of the regather; trip counts gate on `alive` so
            # dead tiles skip the loops entirely. Identity chunk ids.
            is_sphere = (i_sel >= 0) & (i_sel < wall_base)
            is_wall = (i_sel >= wall_base) & (i_sel < box_base)
            is_box = i_sel >= box_base

            def scatter_chunk(c, carry):
                base = c * _unroll()
                in_chunk = (
                    is_sphere & (i_sel >= base) & (i_sel < base + _unroll())
                )

                @pl.when(jnp.any(in_chunk))
                def _():
                    for u in range(_unroll()):
                        idx = base + u
                        m = is_sphere & (i_sel == idx)
                        mf = m.astype(jnp.float32)
                        sums = [jnp.sum(mf * ct_a[cc]) for cc in
                                (0, 1, 2, 3)] + [jnp.float32(0.0)] * 2 + [
                            jnp.sum(mf * ct_a[cc]) for cc in range(6, 14)
                        ]
                        cur = pg_ref[0, 0, pl.dslice(idx, 1), :]
                        pg_ref[0, 0, pl.dslice(idx, 1), :] = (
                            cur + row_vals(sums)
                        )

                return carry

            if n_chunks and wall_base:
                jax.lax.fori_loop(
                    0, jnp.where(alive, n_chunks, 0), scatter_chunk, 0
                )

            def scatter_flat(i, row0, mask_type):
                m = mask_type & (i_sel == i + (wall_base if row0 == n_s_pad
                                               else box_base))
                mf = m.astype(jnp.float32)
                sums = [jnp.sum(mf * ct_a[cc]) for cc in range(14)]
                cur = pg_ref[0, 0, pl.dslice(row0 + i, 1), :]
                pg_ref[0, 0, pl.dslice(row0 + i, 1), :] = (
                    cur + row_vals(sums)
                )
                return 0

            if n_w:
                jax.lax.fori_loop(
                    0, jnp.where(alive, n_w, 0),
                    lambda i, cr: scatter_flat(i, n_s_pad, is_wall), 0,
                )
            if n_b:
                jax.lax.fori_loop(
                    0, jnp.where(alive, n_b, 0),
                    lambda i, cr: scatter_flat(i, n_s_pad + n_w_pad, is_box),
                    0,
                )

        cox_ref[:], coy_ref[:], coz_ref[:] = ct7[0], ct7[1], ct7[2]
        cdx_ref[:], cdy_ref[:], cdz_ref[:] = ct7[3], ct7[4], ct7[5]
        cw_ref[:] = ct7[6]

        srow = jnp.zeros((8, _SL_C), jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, (8, _SL_C), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (8, _SL_C), 1)
        for idx, v in enumerate(ls_acc):
            srow = jnp.where(
                (row == idx // _SL_C) & (lane == idx % _SL_C), v, srow
            )
        ls_ref[0, 0] = srow

    return kernel


@_jit_cfg(static_argnames=("n_w", "n_b", "wall_base", "box_base", "n_chunks",
                           "n_s_pad", "n_w_pad", "n_b_pad", "n_pt", "n_sun",
                           "depth", "sl_r", "interpret"))
def _trace_whole_bwd(tables, mats, lights, sky, level_planes, ct_acc, *,
                     n_w: int, n_b: int, wall_base: int, box_base: int,
                     n_chunks: int, n_s_pad: int, n_w_pad: int,
                     n_b_pad: int, n_pt: int, n_sun: int, depth: int,
                     sl_r: int, interpret: bool):
    """Fused reverse sweep over all levels; see `_kernel_trace_whole_bwd`.

    Returns ``(ct_o3, ct_d3, ct_w, param_grad_tiles, ls_stats)`` exactly
    like a `_trace_level_bwd` chain would after its last (k=0) level.
    """
    h, w = level_planes[0].shape
    grid = (h // sl_r, w // _SL_C)
    th, tw = grid
    n_rows_tot = n_s_pad + n_w_pad + n_b_pad
    spec = pl.BlockSpec(
        (sl_r, _SL_C), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
    )
    stats_spec = pl.BlockSpec(
        (1, 1, 8, _SL_C), lambda i, j, *_: (i, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    pg_spec = pl.BlockSpec(
        (1, 1, n_rows_tot, 16), lambda i, j, *_: (i, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    n_in = 9 * (depth + 1) + 3
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=25 + 9 + 13,
        grid=grid,
        in_specs=[spec] * n_in,
        out_specs=(spec,) * 7 + (pg_spec, stats_spec),
    )
    f32 = _out_struct((h, w), jnp.float32, level_planes[0])
    return pl.pallas_call(
        _kernel_trace_whole_bwd(n_w, n_b, wall_base, box_base, n_chunks,
                                n_s_pad, n_w_pad, n_b_pad, n_pt, n_sun,
                                depth),
        out_shape=(f32,) * 7
        + (_out_struct((th, tw, n_rows_tot, 16), jnp.float32,
                       level_planes[0]),
           _out_struct((th, tw, 8, _SL_C), jnp.float32, level_planes[0])),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*tables, *mats, *lights, sky, *level_planes, *ct_acc)


def _trace_levels_pallas_bwd_impl(
    scene: Scene, ts, idxs, rays_levels, w_levels, sl_levels, ct_acc: V3, *,
    depth: int, interpret: bool | None = None,
):
    """Whole-trace backward from saved forward residuals.

    Returns ``(scene_ct, ct_o V3, ct_d V3)`` — the custom-VJP cotangents
    for `trace.py _pallas_trace`. Everything selection-shaped (ts, idxs,
    masks, shortlists) is constant; gradients flow through the regathered
    attributes (scattered into per-tile parameter-gradient blocks INSIDE
    the kernel — no one-hot matmuls, whose staged [rays, prims] buffers
    dominated the XLA backward), the ray chain (level k's ray cotangents
    feed level k-1), the throughput products, and the light/sky scalars.
    """
    from raytracer_tpu.ops.trace import _packed_table

    if interpret is None:
        interpret = not pallas_available()
    sl_r = _check_sl_r(_SL_R)
    hp, wp = rays_levels[0][0].shape
    h, w = ct_acc.x.shape

    sg = jax.lax.stop_gradient
    tables, counts_tbl = _packed_fold_tables(sg(scene))
    srad, mats, n_s_pad, n_w_pad = _packed_mat_tables(sg(scene), counts_tbl)
    n_b_pad = max(counts_tbl["n_b_pad"], 1)
    n_s = counts_tbl["n_s"]
    n_w_real, n_b_real = counts_tbl["n_w"], counts_tbl["n_b"]
    wall_base, box_base = n_s, n_s + n_w_real
    n_chunks = counts_tbl["n_s_pad"] // _unroll() if counts_tbl["n_s_pad"] else 0
    n_chunks_eff = n_chunks if n_chunks else 1

    def prep_ct(c):
        c = jnp.asarray(c, jnp.float32)
        if hp != h or wp != w:
            c = jnp.pad(c, ((0, hp - h), (0, wp - w)))
        return c

    ct3 = (prep_ct(ct_acc.x), prep_ct(ct_acc.y), prep_ct(ct_acc.z))

    (light_tbls, sky_tbl), vjp_light = jax.vjp(
        lambda sc: _light_sky_tables(sc)[:2], scene
    )
    n_pt = scene.lights.point_position.shape[0]
    n_sun = scene.lights.sun_color.shape[0]

    zero = jnp.zeros((hp, wp), jnp.float32)
    n_rows_tot = n_s_pad + n_w_pad + n_b_pad

    # Fused reverse sweep — exactly the scene class whose forward fused
    # (same eligibility conditions; within one value_and_grad trace the
    # forward and backward see the same config, so the residual shortlists
    # are identity lists and the whole-sweep kernel is valid).
    use_fused = (
        _FUSED_BWD and _FUSED_RESID and _SLICES == 1
        and 1 <= depth <= _FUSED_MAX_DEPTH
        and 0 < n_chunks <= _FUSED_MAX_CHUNKS
        and all(sl == sl_levels[0][2] for _, _, sl in sl_levels)
    )
    if use_fused:
        level_planes = []
        for k in range(depth + 1):
            level_planes += list(rays_levels[k]) + [
                w_levels[k], ts[k], idxs[k]
            ]
        outs = _trace_whole_bwd(
            tables, (srad,) + mats, light_tbls, sky_tbl,
            tuple(level_planes), ct3,
            n_w=counts_tbl["n_w"], n_b=counts_tbl["n_b"],
            wall_base=wall_base, box_base=box_base,
            n_chunks=n_chunks_eff, n_s_pad=n_s_pad, n_w_pad=n_w_pad,
            n_b_pad=n_b_pad, n_pt=n_pt, n_sun=n_sun, depth=depth,
            sl_r=sl_levels[0][2], interpret=interpret, cfg=_cfg_key(),
        )
        ct_rays = outs[0:6]
        pg_sum = outs[7].sum(axis=(0, 1))
        ls_sum = outs[8].sum(axis=(0, 1)).reshape(-1)
    else:
        ct_next = (zero,) * 7  # d(next o3/d3/w) — nothing after the last
        pg_sum = jnp.zeros((n_rows_tot, 16), jnp.float32)
        ls_sum = jnp.zeros((8 * _SL_C,), jnp.float32)
        ct_rays = (zero,) * 6
        for k in reversed(range(depth + 1)):
            level_in = rays_levels[k] + (w_levels[k], ts[k], idxs[k])
            chunk_list, counts, sl_k = sl_levels[k]
            outs = _trace_level_bwd(
                tables, chunk_list, counts, (srad,) + mats, light_tbls,
                sky_tbl, level_in, ct3, ct_next,
                n_w=counts_tbl["n_w"], n_b=counts_tbl["n_b"],
                wall_base=wall_base, box_base=box_base,
                n_chunks=n_chunks_eff, n_s_pad=n_s_pad, n_w_pad=n_w_pad,
                n_b_pad=n_b_pad, n_pt=n_pt, n_sun=n_sun,
                is_last=(k == depth), sl_r=sl_k, interpret=interpret,
                cfg=_cfg_key(),
            )
            ct_rays = outs[0:6]
            ct_w_in = outs[6]
            pg_sum = pg_sum + outs[7].sum(axis=(0, 1))
            ls_sum = ls_sum + outs[8].sum(axis=(0, 1)).reshape(-1)
            ct_next = ct_rays + (ct_w_in,)

    # --- scene geometry/material gradients: per-tile blocks -> the packed
    # attribute table layout -> scene leaves via _packed_table's transpose.
    # pg rows: spheres [0, n_s), walls [n_s_pad, ..), boxes after; pg cols
    # 0-5 = geometry (table cols 8-13), 6-13 = materials (table cols 0-7).
    def table_grad_rows(row0, n):
        block = jax.lax.dynamic_slice_in_dim(pg_sum, row0, max(n, 1), 0)
        return jnp.concatenate([block[:, 6:14], block[:, 0:6]], axis=1)

    parts = []
    if n_s:
        parts.append(table_grad_rows(0, n_s)[:n_s])
    if n_w_real:
        parts.append(table_grad_rows(n_s_pad, n_w_real)[:n_w_real])
    if n_b_real:
        parts.append(table_grad_rows(n_s_pad + n_w_pad, n_b_real)[:n_b_real])
    table_grad = parts[0] if len(parts) == 1 else jnp.concatenate(parts)
    _, vjp_tbl = jax.vjp(_packed_table, scene)
    (scene_ct_geom,) = vjp_tbl(table_grad)

    # Unpack the light/sky scalar cotangents in the kernel's packing order.
    pos = 0

    def take_block(n):
        nonlocal pos
        vals = [ls_sum[pos + i] for i in range(n)]
        pos += n
        return vals

    def col_cts(n_lights):
        cols = [[] for _ in range(6)]
        for _ in range(n_lights):
            v = take_block(6)
            for c in range(6):
                cols[c].append(v[c])
        if not n_lights:
            return [jnp.zeros((1,), jnp.float32)] * 6
        return [jnp.stack(c) for c in cols]

    pt_cols = col_cts(n_pt)
    sun_cols = col_cts(n_sun)
    ct_sky = jnp.stack(take_block(10))
    ct_light_tbls = tuple(pt_cols + sun_cols)

    (scene_ct_light,) = vjp_light((ct_light_tbls, ct_sky))
    scene_ct = jax.tree_util.tree_map(
        lambda a, b: a + b, scene_ct_geom, scene_ct_light
    )

    def crop(c):
        return c[:h, :w] if (hp != h or wp != w) else c

    ct_o = V3(crop(ct_rays[0]), crop(ct_rays[1]), crop(ct_rays[2]))
    ct_d = V3(crop(ct_rays[3]), crop(ct_rays[4]), crop(ct_rays[5]))
    return scene_ct, ct_o, ct_d


@_jit_cfg(static_argnames=("n_w", "n_b", "wall_base", "box_base", "tiles_w",
                     "n_chunks", "n_s_pad", "n_w_pad", "sl_r", "interpret"))
def _fold_shortlist_hit(tables, chunk_list, counts, gtables, slab, mats,
                        rays, *, n_w: int, n_b: int, wall_base: int,
                        box_base: int, tiles_w: int, n_chunks: int,
                        n_s_pad: int, n_w_pad: int, sl_r: int,
                        interpret: bool):
    h, w = rays[0].shape
    grid = (h // sl_r, w // _SL_C)
    spec = pl.BlockSpec(
        (sl_r, _SL_C), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=38 + 6 + 9,
        grid=grid,
        in_specs=[spec] * 7,
        out_specs=(spec,) * 16,
    )
    f32 = _out_struct((h, w), jnp.float32, rays[0])
    return pl.pallas_call(
        _kernel_shortlist_hit(n_w, n_b, wall_base, box_base, tiles_w,
                              n_chunks, n_s_pad, n_w_pad),
        out_shape=(f32, _out_struct((h, w), jnp.int32, rays[0])) + (f32,) * 14,
        grid_spec=grid_spec,
        interpret=interpret,
    )(*tables, chunk_list, counts, *gtables, slab, *mats, *rays)


@_jit_cfg(static_argnames=("n_w", "n_b", "wall_base", "box_base", "tiles_w",
                     "n_chunks", "sl_r", "interpret"))
def _fold_shortlist(tables, chunk_list, counts, gtables, slab, rays, *,
                    n_w: int, n_b: int, wall_base: int, box_base: int,
                    tiles_w: int, n_chunks: int, sl_r: int, interpret: bool):
    h, w = rays[0].shape
    grid = (h // sl_r, w // _SL_C)
    spec = pl.BlockSpec(
        (sl_r, _SL_C), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=38 + 6,
        grid=grid,
        in_specs=[spec] * 7,
        out_specs=(spec, spec),
    )
    return pl.pallas_call(
        _kernel_shortlist(n_w, n_b, wall_base, box_base, tiles_w, n_chunks),
        out_shape=(
            _out_struct((h, w), jnp.float32, rays[0]),
            _out_struct((h, w), jnp.int32, rays[0]),
        ),
        grid_spec=grid_spec,
        interpret=interpret,
    )(*tables, chunk_list, counts, *gtables, slab, *rays)


def _dummy_gtables():
    """Never-reachable culling tables for sphere-free scenes: bounding
    spheres with r2 = -1 (the tube gate always rejects) and inverted AABBs
    (lo > hi, the slab test always rejects)."""
    z1 = jnp.zeros((1,), jnp.float32)
    neg = jnp.full((1,), -1.0, jnp.float32)
    lo = jnp.full((1,), 1e8, jnp.float32)
    hi = jnp.full((1,), -1e8, jnp.float32)
    return (z1, z1, z1, z1, neg, z1, z1, z1, z1, neg, lo, lo, lo, hi, hi, hi)


def _slice_reduce(x, th, tw, op, sl_r=_SL_R):
    """Reduce to [th, tw, _SLICES] — one value per tile ROW SLICE."""
    rg = max(sl_r // _SLICES, 1)
    r = op(x.reshape(th, _SLICES, rg, tw, _SL_C), axis=(2, 4))
    return jnp.moveaxis(r, 1, 2)


def _chunk_culling_tables(scene: Scene, n_chunks: int):
    """Scene-only culling tables: chunk AABBs, tube-gate bounding spheres,
    and the sphere-set slab. Shared by phase A and the stats consumer."""
    s = scene.spheres
    n_s = len(s)
    BIG = jnp.float32(1e30)

    lo = jnp.min(s.center - s.radius[:, None], axis=0) - _AABB_PAD
    hi = jnp.max(s.center + s.radius[:, None], axis=0) + _AABB_PAD

    pad = n_chunks * _unroll() - n_s
    real = jnp.arange(n_chunks * _unroll()) < n_s

    def padded(x, fill):
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
        return x.reshape(n_chunks, _unroll())

    real_m = real.reshape(n_chunks, _unroll())
    c_lo, c_hi = [], []
    for k in range(3):
        cmin = jnp.where(real_m, padded(s.center[:, k] - s.radius, 0.0), BIG)
        cmax = jnp.where(real_m, padded(s.center[:, k] + s.radius, 0.0), -BIG)
        c_lo.append(cmin.min(axis=1) - _AABB_PAD)
        c_hi.append(cmax.max(axis=1) + _AABB_PAD)

    # Chunk bounding spheres for the kernel's tube gate: AABB midpoint
    # center, exact max member reach as radius (+_GATE_PAD for f32 drift
    # in the kernel's distance polynomial). Empty-pad chunks get r = -1 so
    # the gate always rejects them (they never appear in shortlists anyway).
    gx = 0.5 * (c_lo[0] + c_hi[0])
    gy = 0.5 * (c_lo[1] + c_hi[1])
    gz = 0.5 * (c_lo[2] + c_hi[2])
    member_reach = jnp.sqrt(
        (padded(s.center[:, 0], 0.0) - gx[:, None]) ** 2
        + (padded(s.center[:, 1], 0.0) - gy[:, None]) ** 2
        + (padded(s.center[:, 2], 0.0) - gz[:, None]) ** 2
    ) + padded(s.radius, 0.0)
    gr = jnp.max(jnp.where(real_m, member_reach, -1.0), axis=1)
    chunk_nonempty = jnp.any(real_m, axis=1)
    gr2 = jnp.where(chunk_nonempty, (gr + _GATE_PAD) ** 2, -1.0)

    # Sub-chunk (8-sphere) bounding spheres for the in-chunk gates — same
    # construction at _SUB granularity. Pad-only sub-chunks get r2 = -1 so
    # their folds (the pad tail of the last chunk) are skipped for free.
    n_sub = _unroll() // _SUB if _unroll() > _SUB else 1
    if n_sub > 1:
        def padded_s(x, fill):
            if pad:
                x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
            return x.reshape(n_chunks * n_sub, _SUB)

        real_s = real.reshape(n_chunks * n_sub, _SUB)
        s_lo, s_hi = [], []
        for k in range(3):
            smin = jnp.where(
                real_s, padded_s(s.center[:, k] - s.radius, 0.0), BIG)
            smax = jnp.where(
                real_s, padded_s(s.center[:, k] + s.radius, 0.0), -BIG)
            s_lo.append(smin.min(axis=1))
            s_hi.append(smax.max(axis=1))
        sgx = 0.5 * (s_lo[0] + s_hi[0])
        sgy = 0.5 * (s_lo[1] + s_hi[1])
        sgz = 0.5 * (s_lo[2] + s_hi[2])
        sub_reach = jnp.sqrt(
            (padded_s(s.center[:, 0], 0.0) - sgx[:, None]) ** 2
            + (padded_s(s.center[:, 1], 0.0) - sgy[:, None]) ** 2
            + (padded_s(s.center[:, 2], 0.0) - sgz[:, None]) ** 2
        ) + padded_s(s.radius, 0.0)
        sgr = jnp.max(jnp.where(real_s, sub_reach, -1.0), axis=1)
        sgr2 = jnp.where(
            jnp.any(real_s, axis=1), (sgr + _GATE_PAD) ** 2, -1.0)
        sgg = sgx * sgx + sgy * sgy + sgz * sgz
    else:
        sgx = sgy = sgz = sgg = jnp.zeros((1,), jnp.float32)
        sgr2 = jnp.full((1,), -1.0, jnp.float32)
    # Chunk AABBs ride along for the in-kernel "aabb" gate geometry
    # (_gate_geom()); already inflated by _AABB_PAD above, and empty-pad
    # chunks have lo > hi so the slab test always rejects them.
    gtables = (gx, gy, gz, gx * gx + gy * gy + gz * gz, gr2,
               sgx, sgy, sgz, sgg, sgr2,
               c_lo[0], c_lo[1], c_lo[2], c_hi[0], c_hi[1], c_hi[2])
    slab = jnp.concatenate([lo, hi, jnp.zeros((2,), jnp.float32)])
    return c_lo, c_hi, gtables, gr, slab


def _phase_a_from_stats(c_lo, c_hi, gtables, gr, stats, n_chunks: int,
                        chunk_reach=None):
    """Per-SLICE shortlists from slice-level reach statistics.

    ``stats`` = (rx_lo, rx_hi, ry_lo, ry_hi, rz_lo, rz_hi, px0, py0, pz0,
    alive), all [th, tw, _SLICES] — produced either by XLA reductions over
    the rays (`_shortlist_phase_a`) or by the kernels' in-VMEM stats rows
    (`_ray_stats` for level 0; the trace megakernel for bounce levels).
    Returns flat ``chunk_list``/``counts`` in C order — entry
    ``(i*tw + j)*_SLICES + s`` is tile (i, j) slice s, matching the
    kernels' SMEM indexing.

    ``chunk_reach`` ([th, tw, n_chunks] bool, optional) intersects the
    AABB-overlap accept set with the kernel-computed per-chunk tube-reach
    union — the decisive cut for divergent bounce tiles whose union AABB
    accepts nearly every chunk."""
    BIG = jnp.float32(1e30)
    rx_lo, rx_hi, ry_lo, ry_hi, rz_lo, rz_hi, px0, py0, pz0, alive = stats
    gx, gy, gz = gtables[:3]

    def overlap(r_lo, r_hi, k):
        return (c_lo[k] <= r_hi[..., None]) & (c_hi[k] >= r_lo[..., None])

    accept = (
        overlap(rx_lo, rx_hi, 0)
        & overlap(ry_lo, ry_hi, 1)
        & overlap(rz_lo, rz_hi, 2)
    )  # [th, tw, n_chunks]
    if chunk_reach is not None:
        # [th, tw, 1?, n_chunks] broadcast over the slice axis of accept.
        accept = accept & chunk_reach[:, :, None, :]

    # Near-to-far shortlist: sort accepted chunk ids by the distance from
    # the tile's segment-start centroid to the chunk's bounding sphere.
    # Rejected chunks sort to the tail via +BIG keys. Correct for any order
    # (the kernel tie-breaks on the global index); near-first just makes
    # best_t tighten early so the tube gate rejects the far tail.
    dist = jnp.sqrt(
        (px0[..., None] - gx) ** 2
        + (py0[..., None] - gy) ** 2
        + (pz0[..., None] - gz) ** 2
    ) - gr
    order = jnp.argsort(jnp.where(accept, dist, BIG), axis=-1)
    chunk_list = order.astype(jnp.int32)
    counts = jnp.where(alive, accept.sum(axis=-1).astype(jnp.int32), -1)
    return chunk_list.reshape(-1), counts.reshape(-1)


# Below this many chunks a per-tile shortlist cannot beat the identity
# list (the kernel's in-kernel gates see the same candidates), so phase A
# skips its per-ray reach statistics entirely — the 3-prim demo (1 chunk)
# pays zero phase-A cost per level.
_PER_TILE_MIN_CHUNKS = 3


def _shortlist_phase_a(scene: Scene, rays, act, th: int, tw: int,
                       n_chunks: int, sl_r: int = _SL_R,
                       per_tile: bool = True,
                       interpret: bool | None = None):
    """Per-tile candidate chunk lists from slab-clipped reach boxes.

    Returns ``(chunk_list [th*tw*n_chunks] i32, counts [th*tw] i32,
    gtables, slab)`` where ``gtables = (gx, gy, gz, gg, gr2)`` are the
    per-chunk bounding spheres for the kernel's tube gate and ``slab`` is
    the padded sphere-set AABB. Each tile's shortlist is sorted near-to-far
    from the tile's segment-start centroid so best_t tightens early.
    All inputs arrive stop-gradiented (the fold is selection-only).

    On a real TPU backend the per-ray reach statistics run in the
    ``_ray_stats`` Pallas kernel (XLA materializes the [H, W] clip
    intermediates through HBM: 8.4 ms at 1080p vs ~0.3 ms in-kernel); the
    pure-XLA path remains for interpret/CPU runs. Both compute identical
    min/max stats — only f32 summation order (the sort-key centroid) can
    differ, and the fold is traversal-order independent.
    """
    ox, oy, oz, dx, dy, dz = rays
    c_lo, c_hi, gtables, gr, slab = _chunk_culling_tables(scene, n_chunks)
    lo, hi = slab[:3], slab[3:6]
    if interpret is None:
        interpret = not pallas_available()

    if n_chunks < _PER_TILE_MIN_CHUNKS:
        per_tile = False
    if per_tile and not interpret:
        with_reach = _TUBE_SHORTLIST and n_chunks <= _chunk_reach_capacity()
        s_all = _ray_stats(
            slab, rays, act.astype(jnp.float32),
            (gtables[:5] + gtables[10:16]) if with_reach else None,
            sl_r=sl_r, n_chunks=n_chunks if with_reach else 0,
            interpret=False, cfg=_cfg_key(),
        )
        stats = _stats_to_phase_a(s_all)
        chunk_list, counts = _phase_a_from_stats(
            c_lo, c_hi, gtables, gr, stats, n_chunks,
            chunk_reach=(
                _stats_to_chunk_reach(s_all, n_chunks) if with_reach else None
            ),
        )
        return chunk_list, counts, gtables, slab
    if not per_tile:
        # Identity shortlist: every slice walks all chunks in Morton order
        # and relies on the in-kernel best-t tube gates (+ the walls-first
        # best_t) for rejection — no per-ray reach statistics at all.
        alive = _slice_reduce(act, th, tw, jnp.any, sl_r)
        counts = jnp.where(alive, n_chunks, -1).astype(jnp.int32)
        chunk_list = jnp.broadcast_to(
            jnp.arange(n_chunks, dtype=jnp.int32),
            (th * tw * _SLICES, n_chunks),
        )
        return chunk_list.reshape(-1), counts.reshape(-1), gtables, slab

    # Per-lane clip of the ray against the slab: any sphere hit point lies
    # on the segment [max(t_en, 0), t_ex] (hit points are inside the AABB).
    def axis_interval(o_c, d_c, lo_c, hi_c):
        ok = jnp.abs(d_c) > 1e-12
        inv = jnp.where(ok, 1.0 / jnp.where(ok, d_c, 1.0),
                        jnp.where(d_c >= 0.0, 1e30, -1e30))
        t1, t2 = (lo_c - o_c) * inv, (hi_c - o_c) * inv
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    ex_lo, ex_hi = axis_interval(ox, dx, lo[0], hi[0])
    ey_lo, ey_hi = axis_interval(oy, dy, lo[1], hi[1])
    ez_lo, ez_hi = axis_interval(oz, dz, lo[2], hi[2])
    t_en = jnp.maximum(jnp.maximum(ex_lo, ey_lo), ez_lo)
    t_ex = jnp.minimum(jnp.minimum(ex_hi, ey_hi), ez_hi)
    t0 = jnp.maximum(t_en, 0.0)
    used = act & (t_ex >= t0) & (t_ex > 0.0)

    BIG = jnp.float32(1e30)

    def seg_minmax(o_c, d_c):
        p1 = o_c + t0 * d_c
        p2 = o_c + t_ex * d_c
        p_lo = jnp.where(used, jnp.minimum(p1, p2), BIG)
        p_hi = jnp.where(used, jnp.maximum(p1, p2), -BIG)
        return (
            _slice_reduce(p_lo, th, tw, jnp.min, sl_r) - _AABB_PAD,
            _slice_reduce(p_hi, th, tw, jnp.max, sl_r) + _AABB_PAD,
        )

    rx_lo, rx_hi = seg_minmax(ox, dx)
    ry_lo, ry_hi = seg_minmax(oy, dy)
    rz_lo, rz_hi = seg_minmax(oz, dz)

    cnt = jnp.maximum(
        _slice_reduce(used.astype(jnp.float32), th, tw, jnp.sum, sl_r), 1.0
    )

    def centroid(o_c, d_c):
        p0 = jnp.where(used, o_c + t0 * d_c, 0.0)
        return _slice_reduce(p0, th, tw, jnp.sum, sl_r) / cnt

    px0, py0, pz0 = centroid(ox, dx), centroid(oy, dy), centroid(oz, dz)
    alive = _slice_reduce(act, th, tw, jnp.any, sl_r)

    stats = (rx_lo, rx_hi, ry_lo, ry_hi, rz_lo, rz_hi, px0, py0, pz0, alive)
    chunk_list, counts = _phase_a_from_stats(
        c_lo, c_hi, gtables, gr, stats, n_chunks
    )
    return chunk_list, counts, gtables, slab


def _packed_mat_tables(scene: Scene, counts: dict):
    """(srad, 8 global material columns) for the hit-record kernel.

    Material rows live at PADDED offsets — spheres at [0, n_s_pad), walls at
    [n_s_pad, n_s_pad + n_w_pad), boxes after — so every in-kernel read is
    in bounds; pad rows are zeros and are only ever read under a false
    winner mask. ``srad`` is the sphere radius column (the winner-normal
    scale, mirroring trace.py `_packed_table` column 11).
    """
    n_s_pad = max(counts["n_s_pad"], 1)
    n_w_pad = max(counts["n_w_pad"], 1)
    n_b_pad = max(counts["n_b_pad"], 1)

    def pad_to(x, size):
        n = x.shape[0]
        if n == size:
            return jnp.asarray(x, jnp.float32)
        return jnp.concatenate(
            [jnp.asarray(x, jnp.float32), jnp.zeros((size - n,), jnp.float32)]
        )

    srad = pad_to(scene.spheres.radius, n_s_pad)

    def col(get):
        parts = []
        for prims, size in (
            (scene.spheres, n_s_pad), (scene.walls, n_w_pad),
            (scene.boxes, n_b_pad),
        ):
            m = prims.material
            parts.append(pad_to(get(m), size))
        return jnp.concatenate(parts)

    mats = (
        col(lambda m: m.color[:, 0]), col(lambda m: m.color[:, 1]),
        col(lambda m: m.color[:, 2]), col(lambda m: m.ambient),
        col(lambda m: m.metallic), col(lambda m: m.diffuse),
        col(lambda m: m.specular), col(lambda m: m.specular_exponent),
    )
    return srad, mats, n_s_pad, n_w_pad


def _hit_closest_pallas_shortlist_impl(
    scene: Scene, o: V3, d: V3, *, active=None, interpret: bool | None = None,
    sl_r: int | None = None,
):
    """Full hit record from the shortlist kernel — no separate gather pass.

    Returns the 16 per-ray arrays ``(t, index, point xyz, normal xyz,
    color rgb, ambient, metallic, diffuse, specular, exponent)`` with the
    same values as ``fold_closest_pallas_shortlist`` + trace.py ``_mm_hit``
    (formula-mirrored; asserted by tests). Selection (and therefore every
    output) is gradient-free — the differentiable path pairs this forward
    with ``_mm_hit``'s backward via custom_vjp in trace.py.
    """
    if interpret is None:
        interpret = not pallas_available()
    if sl_r is None:
        # Bounce calls arrive with an `active` mask; their rays diverge, so
        # finer tiles keep the per-tile reach boxes (and shortlists) tight.
        sl_r = _check_sl_r(_SL_R if active is None else _SL_R_BOUNCE)
    shape = jnp.broadcast_shapes(o.x.shape, d.x.shape)
    h, w = shape
    hp = -(-h // sl_r) * sl_r
    wp = -(-w // _SL_C) * _SL_C

    def prep(c, fill):
        c = jnp.broadcast_to(c, shape)
        if hp != h or wp != w:
            c = jnp.pad(c, ((0, hp - h), (0, wp - w)), constant_values=fill)
        return c

    rays = (
        prep(o.x, 0.0), prep(o.y, 0.0), prep(o.z, 0.0),
        prep(d.x, 0.0), prep(d.y, 0.0), prep(d.z, 1.0),
    )
    if active is None:
        act = jnp.ones((hp, wp), bool)
        if hp != h or wp != w:
            act = jnp.pad(
                jnp.ones((h, w), bool), ((0, hp - h), (0, wp - w)),
                constant_values=False,
            )
    else:
        act = prep(active, False)

    tables, counts_tbl = _packed_fold_tables(scene)
    srad, mats, n_s_pad, n_w_pad = _packed_mat_tables(scene, counts_tbl)
    th, tw = hp // sl_r, wp // _SL_C
    n_chunks = counts_tbl["n_s_pad"] // _unroll() if counts_tbl["n_s_pad"] else 0

    if n_chunks == 0:
        alive = _slice_reduce(act, th, tw, jnp.any, sl_r)
        counts = jnp.where(alive, 0, -1).astype(jnp.int32).reshape(-1)
        n_chunks_eff = 1
        chunk_list = jnp.zeros((th * tw * _SLICES,), jnp.int32)
        gtables = _dummy_gtables()
        slab = jnp.zeros((8,), jnp.float32)
    else:
        chunk_list, counts, gtables, slab = _shortlist_phase_a(
            scene, rays, act, th, tw, n_chunks, sl_r,
            per_tile=(active is None) or _PHASE_A_BOUNCE,
            interpret=interpret,
        )
        n_chunks_eff = n_chunks

    outs = _fold_shortlist_hit(
        tables, chunk_list, counts, gtables, slab, (srad,) + mats,
        rays + (act.astype(jnp.float32),),
        n_w=counts_tbl["n_w"], n_b=counts_tbl["n_b"],
        wall_base=counts_tbl["n_s"],
        box_base=counts_tbl["n_s"] + counts_tbl["n_w"],
        tiles_w=tw, n_chunks=n_chunks_eff, n_s_pad=n_s_pad,
        n_w_pad=n_w_pad, sl_r=sl_r, interpret=interpret,
        cfg=_cfg_key(),
    )
    if hp != h or wp != w:
        outs = tuple(x[:h, :w] for x in outs)
    return outs


def _fold_closest_pallas_shortlist_impl(
    scene: Scene, o: V3, d: V3, *, active=None, interpret: bool | None = None,
    sl_r: int | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(min-t, argmin index) via the two-level shortlist fold.

    Drop-in for the other folds (bit-compatible; culling is conservative).
    ``active``: optional [H, W] bool — lanes whose result is unused (zero
    path throughput); they are excluded from reach stats and may return
    arbitrary miss records.
    """
    if interpret is None:
        interpret = not pallas_available()
    if sl_r is None:
        # Bounce calls arrive with an `active` mask; their rays diverge, so
        # finer tiles keep the per-tile reach boxes (and shortlists) tight.
        sl_r = _check_sl_r(_SL_R if active is None else _SL_R_BOUNCE)
    shape = jnp.broadcast_shapes(o.x.shape, d.x.shape)
    h, w = shape
    hp = -(-h // sl_r) * sl_r
    wp = -(-w // _SL_C) * _SL_C

    def prep(c, fill):
        c = jnp.broadcast_to(c, shape)
        if hp != h or wp != w:
            c = jnp.pad(c, ((0, hp - h), (0, wp - w)), constant_values=fill)
        return c

    rays = (
        prep(o.x, 0.0), prep(o.y, 0.0), prep(o.z, 0.0),
        prep(d.x, 0.0), prep(d.y, 0.0), prep(d.z, 1.0),
    )
    if active is None:
        act = jnp.ones((hp, wp), bool)
        if hp != h or wp != w:
            act = jnp.pad(
                jnp.ones((h, w), bool), ((0, hp - h), (0, wp - w)),
                constant_values=False,
            )
    else:
        act = prep(active, False)

    tables, counts_tbl = _packed_fold_tables(scene)
    th, tw = hp // sl_r, wp // _SL_C
    n_chunks = counts_tbl["n_s_pad"] // _unroll() if counts_tbl["n_s_pad"] else 0

    if n_chunks == 0:
        # No spheres: every tile folds walls/boxes brute-force (alive gate).
        alive = _slice_reduce(act, th, tw, jnp.any, sl_r)
        counts = jnp.where(alive, 0, -1).astype(jnp.int32).reshape(-1)
        n_chunks_eff = 1
        chunk_list = jnp.zeros((th * tw * _SLICES,), jnp.int32)
        gtables = _dummy_gtables()
        slab = jnp.zeros((8,), jnp.float32)
    else:
        chunk_list, counts, gtables, slab = _shortlist_phase_a(
            scene, rays, act, th, tw, n_chunks, sl_r,
            per_tile=(active is None) or _PHASE_A_BOUNCE,
            interpret=interpret,
        )
        n_chunks_eff = n_chunks

    bt, bi = _fold_shortlist(
        tables, chunk_list, counts, gtables, slab,
        rays + (act.astype(jnp.float32),),
        n_w=counts_tbl["n_w"], n_b=counts_tbl["n_b"],
        wall_base=counts_tbl["n_s"],
        box_base=counts_tbl["n_s"] + counts_tbl["n_w"],
        tiles_w=tw, n_chunks=n_chunks_eff, sl_r=sl_r, interpret=interpret,
        cfg=_cfg_key(),
    )
    if hp != h or wp != w:
        bt, bi = bt[:h, :w], bi[:h, :w]
    return bt, bi




def _unrolled(name, impl):
    """Public entry: pins the scene-adaptive chunk size for the build."""
    import functools as _ft

    @_ft.wraps(impl)
    def wrapper(scene, *args, **kwargs):
        with _use_unroll(len(scene.spheres)):
            return impl(scene, *args, **kwargs)

    wrapper.__name__ = name
    return wrapper


fold_closest_pallas = _unrolled(
    "fold_closest_pallas", _fold_closest_pallas_impl)
fold_closest_pallas_shortlist = _unrolled(
    "fold_closest_pallas_shortlist", _fold_closest_pallas_shortlist_impl)
hit_closest_pallas_shortlist = _unrolled(
    "hit_closest_pallas_shortlist", _hit_closest_pallas_shortlist_impl)
trace_levels_pallas = _unrolled(
    "trace_levels_pallas", _trace_levels_pallas_impl)
trace_levels_pallas_bwd = _unrolled(
    "trace_levels_pallas_bwd", _trace_levels_pallas_bwd_impl)


# Tag consumed by trace.py closest_hit_soa: this fold family has a sibling
# kernel (`hit_closest_pallas_shortlist`) emitting the full hit record, so
# large scenes skip the mm attribute gather on the forward pass.
fold_closest_pallas_shortlist._emits_hit_record = True
