"""Pallas TPU megakernels for the SOFT (differentiable) visibility path.

The XLA soft compositor (diff/soft.py `trace_soft`) streams primitives with
a `lax.scan` whose 14-plane carry round-trips HBM every 8 spheres, and its
reverse-mode pass replays those sweeps from HBM residuals — measured on the
v5e at the BASELINE config-4 shape (1080p, 64 spheres, depth 1): 127 ms
forward, 389 ms value_and_grad, ~8x over the arithmetic floor. These
kernels run the SAME math tile-resident: per reflection level, ONE Pallas
pass composites every primitive over a (rows, 128) ray tile entirely in
VMEM, and the backward pass `jax.vjp`s the identical level function inside
a second kernel (the architecture of the hard path's trace megakernels,
ops/pallas_fold.py) — parameter cotangents reduce in-kernel to one
per-tile scalar block.

Primitive streaming (round 4): spheres are no longer unrolled into the
kernel body. Both kernels `fori_loop` over 8-sphere chunks, reading the
per-sphere scalars from the scalar-prefetch tables at runtime indices, so
Mosaic compile time is O(chunk), not O(N) — this lifts the old 128-sphere
kernel cap to 1024 (the c5 scale) with one compiled body.

Soft tube gate (round 4): each chunk carries a bounding sphere inflated by
the coverage sigmoid's f32 underflow width. A sphere's coverage is
``sigmoid(disc / (2 r tau))``, which is EXACTLY 0.0 in f32 once the
argument is below about -104 (tanh/exp both underflow past the smallest
denormal), and every cotangent through it is then exactly 0 too. So a
chunk whose inflated bounding sphere the ray line cannot approach — or
that lies entirely behind the ray origin by more than the behind-camera
sigmoid's underflow width — contributes EXACT ZEROS to the composite and
to every gradient, and the kernels `lax.cond`-skip it. This is the hard
path's best-t tube gate (ops/pallas_fold.py) transplanted to the soft
path, bit-exact by construction rather than by argmin monotonicity.

Math parity: the per-primitive coverage/depth-softmax/shading formulas are
IMPORTED from diff/soft.py (`_sphere_alpha_t_scalar`, `_wall_alpha_t_scalar`,
`_box_alpha_t_scalar`, `_shade_point_scalar`), so the kernel path and the
XLA path share one source of truth. The recursion (reference:
recursive_ray_tracing, main.cpp:89-119, relaxed per diff/soft.py) is
restructured front-to-back exactly like the hard path's `trace_soa`:

    C_k = local_k + coeff_k * C_{k+1}
    local_k = base_k * cov_k + sky_k * (1 - cov_k)
    coeff_k = m_hat_k * cov_k        (0 at the last level)

which is algebraically identical to `trace_soft`'s
``fg * cov + sky * (1 - cov)`` with ``fg = base + m_hat * C_refl`` —
the accumulator carries ``acc += w * local_k``, ``w *= coeff_k``.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracer_tpu.core.types import Scene
from raytracer_tpu.core.v3 import V3
from raytracer_tpu.ops.pallas_fold import (
    _SL_C,
    _out_struct,
    _srecip,
    pallas_available,
)
from raytracer_tpu.ops.trace import _REFLECT_EPS, _wall_tables

__all__ = ["soft_trace_pallas", "soft_pallas_supported"]

# Forward/backward row-tile heights. Re-swept 2026-08-20 AFTER the round-5
# AABB gates + zero-replay backward (process-per-config, 1080p d1 soft
# fit, v5e): 32/32 -> 1024-sph 373 ms / 64-sph 27.3; 32/16 -> 377/33.9;
# 64/64 -> 436/30.8. 32/32 wins at every scale (finer tiles tighten the
# chunk gates; the earlier sphere-gate-era sweep agreed).
_SOFT_SL_R = int(os.environ.get("RT_SOFT_SL_R", "32"))
# The backward re-tiles the forward's padded planes, so RT_SOFT_SL_R_BWD
# must divide RT_SOFT_SL_R.
_SOFT_SL_R_BWD = int(os.environ.get("RT_SOFT_SL_R_BWD", "32"))
# Sphere-table granularity (padding quantum AND the fori_loop chunk size).
# Swept 2026-08-20 under the AABB chunk gates (process-per-config, 1080p
# d1 soft fit, v5e): 1024 spheres 8 -> 529 ms, 16 -> 533, 32 -> 605;
# 64 spheres 8 -> 37.6. The 8-sphere chunk's tighter gates beat fewer
# fori iterations at every scale tried.
_SOFT_CHUNK = int(os.environ.get("RT_SOFT_CHUNK", "8"))
# Backward-kernel scoped-VMEM cap (see the compiler_params note below).
_SOFT_BWD_VMEM_LIMIT = int(
    os.environ.get("RT_SOFT_BWD_VMEM", str(64 * 1024 * 1024))
)
# Kernel-path sphere cap. The backward's per-key cotangent accumulators
# are (8, 128) lane-slot planes holding _SLOT_CAP spheres each; past one
# plane the scatter streams ADDITIONAL planes per key (sphere i -> plane
# i // _SLOT_CAP, row/lane from i % _SLOT_CAP), so the old hard 1024
# cliff (VERDICT r4 item 3) is gone — the cap below only bounds the
# fori-carry footprint (12 keys x n_planes x 4 KB). Beyond it trace_soft
# falls back to the chunk-scanned XLA path.
_SOFT_MAX_SPHERES = int(os.environ.get("RT_SOFT_PALLAS_MAX_SPHERES", "4096"))
# Spheres per (8, 128) cotangent plane. Module-level so tests can shrink
# it to exercise the multi-plane scatter on small scenes.
_SLOT_CAP = 8 * _SL_C


def _sct_planes(n_s_pad: int) -> int:
    """Cotangent lane-slot planes per sphere key."""
    return max(-(-n_s_pad // _SLOT_CAP), 1)


_SOFT_PALLAS = os.environ.get("RT_SOFT_PALLAS", "1") != "0"
# Soft tube gate (A/B knob). Margins are in sigmoid-argument units. The
# exactness floor: XLA's logistic is tanh-based (exactly 0.0 below
# x ~ -18); a pure exp form underflows 1/(1+exp(-x)) to 0.0 below
# x ~ -89 (exp overflows f32 at 88.7). 128 keeps 1.4x headroom over the
# WORST form plus the _SOFT_GATE_PAD absorbing geometry rounding —
# tightened from 256/192 in round 5 (r_eff = sqrt(r^2 + M r tau) shrinks
# visibly with M; 1024-sphere fit 529 -> 506 ms). The f32-underflow
# canary test (tests/test_pallas_soft.py) pins the XLA floor; the
# tests_tpu parity lane pins Mosaic's.
_SOFT_TUBE_GATE = os.environ.get("RT_SOFT_TUBE_GATE", "1") != "0"
# A/B knob: one vjp per 8-sphere chunk (batched) vs one per sphere
# (streamed). Measured a LOSS (v5e 2026-08-21, 1080p d1 soft fit,
# process-per-config): 64-sph 27.1 -> 32.4 ms, 1024-sph 373.7 -> 376.8 —
# the 8-sphere residual set livening together costs Mosaic more register/
# VMEM pressure than the per-call plumbing it saves. Default streamed.
_SOFT_CHUNK_VJP = os.environ.get("RT_SOFT_CHUNK_VJP", "0") != "0"
# A/B knob: per-sphere EXACT alpha gate inside accepted chunks — probe
# the coverage product (the cheap half of the contrib) and lax.cond-skip
# the shading/softmax payload when it is exactly 0 on every lane. Exact
# for values and gradients by the same underflow argument as the chunk
# gate (alpha == 0 kills every outgoing chain). Measured a LOSS (v5e
# 2026-08-21, 1024-sph 1080p d1 soft forward: 151 -> 177 ms): ~240
# per-sphere conds/tile stall the scalar pipeline more than the skipped
# shading saves — the soft twin of the hard path's sub-chunk-gate
# negative result. Default OFF.
_SOFT_SPHERE_GATE = os.environ.get("RT_SOFT_SPHERE_GATE", "0") != "0"
_GATE_SIG_MARGIN = float(os.environ.get("RT_SOFT_GATE_SIG_MARGIN", "128"))
_GATE_T_MARGIN = float(os.environ.get("RT_SOFT_GATE_T_MARGIN", "128"))
_SOFT_GATE_PAD = 1e-2  # absolute bounding-sphere inflation (f32 drift)

_FAR = 1e4  # mirror diff/soft.py: reference depth for rays that hit nothing
_ALPHA_REF = 0.3


# Test hook: take the kernel path on CPU too (interpret mode) — lets the
# suite pin kernel-under-shard_map semantics without a TPU.
_FORCE_KERNEL = False


def soft_pallas_supported(scene: Scene) -> bool:
    """True when the soft megakernel path can run this scene on this backend."""
    n_s = len(scene.spheres)
    n_prims = scene.num_primitives
    return (
        _SOFT_PALLAS
        and (pallas_available() or _FORCE_KERNEL)
        and 0 < n_prims
        and n_s <= _SOFT_MAX_SPHERES
    )


# ---------------------------------------------------------------------------
# Parameter tables: every differentiable scalar the level math consumes, as
# named 1-D f32 arrays. The kernels receive them via scalar prefetch; the
# backward maps the kernel's per-scalar cotangents back to the scene pytree
# through jax.vjp of THIS function — so wall-basis derivation, sun
# normalization, and sphere padding all transpose for free.
# ---------------------------------------------------------------------------


def _pad_to(x, n, fill):
    pad = n - x.shape[0]
    if pad > 0:
        x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
    return x


def _soft_param_arrays(scene: Scene, tau, tau_z, n_s_pad: int) -> dict:
    """dict[str, f32[...]] of all level-math scalars. The sorted-key order
    of the NON-sphere keys is the packing order for the backward's static
    cotangent block; sphere keys (``s_*``) ride their own lane-slot planes.

    Pad spheres are never-hit (center 1e8 -> coverage sigmoid underflows to
    exactly 0, mirroring `_sphere_param_chunks`)."""
    s, m = scene.spheres, scene.spheres.material
    out = {}
    cols = {
        "cx": (s.center[:, 0], 1e8), "cy": (s.center[:, 1], 1e8),
        "cz": (s.center[:, 2], 1e8), "r": (s.radius, 1e-3),
        "colr": (m.color[:, 0], 0.0), "colg": (m.color[:, 1], 0.0),
        "colb": (m.color[:, 2], 0.0), "amb": (m.ambient, 0.0),
        "kd": (m.diffuse, 0.0), "ks": (m.specular, 0.0),
        "exp": (m.specular_exponent, 1.0), "met": (m.metallic, 0.0),
    }
    for k, (v, fill) in cols.items():
        out["s_" + k] = _pad_to(jnp.asarray(v, jnp.float32), n_s_pad, fill)

    def one(x):  # size >= 1 so scalar prefetch never sees a 0-length array
        x = jnp.asarray(x, jnp.float32)
        return x if x.shape[0] else jnp.zeros((1,), jnp.float32)

    walls = scene.walls
    wtab = _wall_tables(walls) if len(walls) else {
        k: jnp.zeros((0,), jnp.float32)
        for k in ("nx", "ny", "nz", "rx", "ry", "rz", "ux", "uy", "uz",
                  "px", "py", "pz", "dplane", "length", "width")
    }
    for k, v in wtab.items():
        out["w_" + k] = one(v)
    wm = walls.material
    for k, v in (("colr", wm.color[:, 0]), ("colg", wm.color[:, 1]),
                 ("colb", wm.color[:, 2]), ("amb", wm.ambient),
                 ("kd", wm.diffuse), ("ks", wm.specular),
                 ("exp", wm.specular_exponent), ("met", wm.metallic)):
        out["w_" + k] = one(v)

    b, bm = scene.boxes, scene.boxes.material
    for k, v in (("mnx", b.minimum[:, 0]), ("mny", b.minimum[:, 1]),
                 ("mnz", b.minimum[:, 2]), ("mxx", b.maximum[:, 0]),
                 ("mxy", b.maximum[:, 1]), ("mxz", b.maximum[:, 2]),
                 ("colr", bm.color[:, 0]), ("colg", bm.color[:, 1]),
                 ("colb", bm.color[:, 2]), ("amb", bm.ambient),
                 ("kd", bm.diffuse), ("ks", bm.specular),
                 ("exp", bm.specular_exponent), ("met", bm.metallic)):
        out["b_" + k] = one(v)

    lights = scene.lights
    lp, lc = lights.point_position, lights.point_color
    out["l_px"], out["l_py"], out["l_pz"] = (
        one(lp[:, 0]), one(lp[:, 1]), one(lp[:, 2]))
    out["l_cr"], out["l_cg"], out["l_cb"] = (
        one(lc[:, 0]), one(lc[:, 1]), one(lc[:, 2]))
    sd = lights.sun_direction
    if lights.sun_color.shape[0]:
        sd = sd * jax.lax.rsqrt(jnp.sum(sd * sd, axis=-1, keepdims=True))
    out["l_sdx"], out["l_sdy"], out["l_sdz"] = (
        one(sd[:, 0]), one(sd[:, 1]), one(sd[:, 2]))
    out["l_scr"], out["l_scg"], out["l_scb"] = (
        one(lights.sun_color[:, 0]), one(lights.sun_color[:, 1]),
        one(lights.sun_color[:, 2]))

    sky = scene.sky
    out["z_sky"] = jnp.concatenate([
        jnp.asarray(sky.horizon_color, jnp.float32),
        jnp.asarray(sky.zenith_color, jnp.float32),
        jnp.asarray(sky.ground_color, jnp.float32),
        jnp.asarray(sky.gradient_exponent, jnp.float32).reshape(1),
    ])
    out["z_tau"] = jnp.asarray(tau, jnp.float32).reshape(1)
    out["z_tau_z"] = jnp.asarray(tau_z, jnp.float32).reshape(1)
    return out


_SPH_KEYS = ("cx", "cy", "cz", "r", "colr", "colg", "colb", "amb", "kd",
             "ks", "exp", "met")
_WALL_GEO_KEYS = ("nx", "ny", "nz", "rx", "ry", "rz", "ux", "uy", "uz",
                  "px", "py", "pz", "dplane", "length", "width")
_MAT_KEYS = ("colr", "colg", "colb", "amb", "kd", "ks", "exp", "met")
_BOX_GEO_KEYS = ("mnx", "mny", "mnz", "mxx", "mxy", "mxz")
_GATE_KEYS = (
    "gcx", "gcy", "gcz", "gg", "gr2", "gsm",  # chunk bounding spheres
    "galx", "galy", "galz", "gahx", "gahy", "gahz",  # chunk AABBs
)

# Chunk-gate geometry, mirroring the hard path's scene-adaptive rule
# (pallas_fold._resolve_gate_geom, VERDICT r4 item 4): multi-chunk scenes
# gate on the inflated chunk AABB slab test (spread members make the
# circumscribed bounding sphere much looser than the box); single-chunk
# scenes keep the bounding sphere. Exactness argument is unchanged — a
# line that misses the inflated box cannot pass within any member's
# sigmoid-underflow radius (member balls are inside the box), and a box
# whose line interval ends before -_GATE_T_MARGIN*tau puts every member
# hit behind the underflow width.
_SOFT_GATE_GEOM = os.environ.get("RT_SOFT_GATE_GEOM", "auto")


def _soft_gate_kind(n_chunks: int) -> str:
    if _SOFT_GATE_GEOM != "auto":
        return _SOFT_GATE_GEOM
    return "aabb" if n_chunks >= 2 else "sphere"


def _n_s_pad(scene: Scene) -> int:
    """Sphere table size: a whole number of chunks, >= 1 chunk (a
    sphere-less scene carries one never-hit pad chunk — alpha == 0)."""
    return max(
        -(-len(scene.spheres) // _SOFT_CHUNK) * _SOFT_CHUNK, _SOFT_CHUNK
    )


def _counts(scene: Scene, n_s_pad: int) -> dict:
    return {
        "n_s": len(scene.spheres),
        "n_s_pad": n_s_pad,
        "n_w": len(scene.walls),
        "n_b": len(scene.boxes),
        "n_pt": scene.lights.point_position.shape[0],
        "n_sun": scene.lights.sun_color.shape[0],
    }


def _soft_gate_arrays(scene: Scene, tau, n_s_pad: int) -> list:
    """Per-chunk gate tables (stop-gradient: gates are control flow whose
    skipped branches are exact zeros; see the module docstring).

    Returns ``[gcx, gcy, gcz, gg, gr2, gsm]`` (each ``f32[n_chunks]``):
    chunk bounding center, its |gc|^2, the squared gate radius (member
    offset + sigmoid-underflow-inflated radius + pad, maxed over the
    chunk's VALID members — pad spheres at 1e8 are exact zeros with or
    without the gate, so they don't belong in the bound), and the member
    spread for the behind-origin test. All-pad chunks get gr2 = -1
    (never reachable)."""
    sg = jax.lax.stop_gradient
    n = len(scene.spheres)
    n_chunks = n_s_pad // _SOFT_CHUNK
    c = sg(jnp.asarray(scene.spheres.center, jnp.float32)).reshape(-1, 3)
    if n_s_pad > n:
        c = jnp.pad(c, ((0, n_s_pad - n), (0, 0)))
    r = _pad_to(sg(jnp.asarray(scene.spheres.radius, jnp.float32)),
                n_s_pad, 0.0)
    valid = (jnp.arange(n_s_pad) < n).reshape(n_chunks, _SOFT_CHUNK)
    c3 = c.reshape(n_chunks, _SOFT_CHUNK, 3)
    rr = r.reshape(n_chunks, _SOFT_CHUNK)
    nv = valid.sum(axis=1)
    gc = (c3 * valid[..., None]).sum(axis=1) / jnp.maximum(nv, 1)[..., None]
    off = jnp.sqrt(jnp.sum((c3 - gc[:, None, :]) ** 2, axis=-1))
    # alpha1 = sigmoid(disc / (2 r tau)) with disc_max = r^2 - rho^2 on the
    # unit-direction line: exactly 0 once rho^2 > r^2 + MARGIN * r * tau.
    r_eff = jnp.sqrt(rr * rr + _GATE_SIG_MARGIN * rr * sg(
        jnp.asarray(tau, jnp.float32)))
    gr = jnp.max(jnp.where(valid, off + r_eff, 0.0), axis=1) + _SOFT_GATE_PAD
    gr2 = jnp.where(nv > 0, gr * gr, -1.0)
    gsm = jnp.max(jnp.where(valid, off, 0.0), axis=1) + _SOFT_GATE_PAD
    # Chunk AABBs over the sigmoid-inflated member balls (the "aabb" gate
    # geometry). All-pad chunks (only the sphere-less scene's mandatory
    # chunk) are rejected by the gate's explicit gr2 >= 0 term — an
    # inverted box can NOT encode emptiness through the slab test's
    # per-axis min/max sort (it becomes accept-all).
    BIG = jnp.float32(1e30)
    vm = valid[..., None]
    ball_lo = c3 - r_eff[..., None]
    ball_hi = c3 + r_eff[..., None]
    glo = jnp.min(jnp.where(vm, ball_lo, BIG), axis=1) - _SOFT_GATE_PAD
    ghi = jnp.max(jnp.where(vm, ball_hi, -BIG), axis=1) + _SOFT_GATE_PAD
    glo = jnp.where((nv > 0)[:, None], glo, BIG)
    ghi = jnp.where((nv > 0)[:, None], ghi, -BIG)
    return [gc[:, 0], gc[:, 1], gc[:, 2], jnp.sum(gc * gc, axis=-1),
            gr2, gsm,
            glo[:, 0], glo[:, 1], glo[:, 2],
            ghi[:, 0], ghi[:, 1], ghi[:, 2]]


def _tbls_from(read, sizes: dict) -> dict:
    """dict[str, tuple-of-scalars] from ``read(key, i)`` (array or SMEM ref).

    Tuple lengths follow the ARRAY sizes (incl. the max(n,1) placeholders),
    so the vjp cotangent tree flattens to exactly one scalar per array
    element — the packing contract with the backward's static block."""
    return {k: tuple(read(k, i) for i in range(n)) for k, n in sizes.items()}


# ---------------------------------------------------------------------------
# The level function: ONE reflection level of the soft compositor. Spheres
# stream through `sread` (dynamic table reads) in gated chunks; walls and
# boxes unroll from the shared tables. Both kernels call these; the
# backward kernel jax.vjp's them — identical math by construction.
# ---------------------------------------------------------------------------


def _lights_of(tbls, cnt):
    """((pt light 6-tuples...), (sun light 6-tuples...)) of traced scalars."""
    pt = tuple(
        (tbls["l_px"][j], tbls["l_py"][j], tbls["l_pz"][j],
         tbls["l_cr"][j], tbls["l_cg"][j], tbls["l_cb"][j])
        for j in range(cnt["n_pt"])
    )
    sun = tuple(
        (tbls["l_sdx"][j], tbls["l_sdy"][j], tbls["l_sdz"][j],
         tbls["l_scr"][j], tbls["l_scg"][j], tbls["l_scb"][j])
        for j in range(cnt["n_sun"])
    )
    return pt, sun


def _tile_geom(rays6, w):
    """Per-tile invariants the chunk gate reuses: (oo, do, w, inv d) with
    oo = o.o, do = d.o (directions are unit by the raygen/reflect
    invariants, CLAUDE.md layout facts); the safe reciprocals feed the
    AABB slab gate."""
    ox, oy, oz, dx, dy, dz = rays6
    oo = ox * ox + oy * oy + oz * oz
    do = dx * ox + dy * oy + dz * oz
    return oo, do, w, _srecip(dx), _srecip(dy), _srecip(dz)


def _chunk_reachable(gate, c, rays6, geom, tau, n_chunks: int):
    """Any-lane reach test for sphere chunk ``c`` (see module docstring).

    Exact-skip conditions per member sphere when this is False for a lane:
    either the ray LINE stays outside the sigmoid-underflow-inflated
    radius / the inflated chunk AABB (coverage factor exactly 0 in f32),
    or the whole chunk sits behind the origin past the behind-camera
    sigmoid's underflow width (second factor exactly 0). Geometry is
    scene-adaptive (`_soft_gate_kind`): "aabb" slab-tests the ray line
    against the chunk box built over the sigmoid-inflated member balls
    (much tighter than the circumscribed sphere for spread chunks —
    hard-path evidence, pallas_fold._resolve_gate_geom); "sphere" keeps
    the chunk bounding sphere."""
    ox, oy, oz, dx, dy, dz = rays6
    oo, do, w, ivx, ivy, ivz = geom
    tau_eff = jnp.maximum(tau, 1e-6)
    if _soft_gate_kind(n_chunks) == "aabb":
        t1x = (gate["galx"][c] - ox) * ivx
        t2x = (gate["gahx"][c] - ox) * ivx
        t1y = (gate["galy"][c] - oy) * ivy
        t2y = (gate["gahy"][c] - oy) * ivy
        t1z = (gate["galz"][c] - oz) * ivz
        t2z = (gate["gahz"][c] - oz) * ivz
        tn = jnp.maximum(
            jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
            jnp.minimum(t1z, t2z),
        )
        tf = jnp.minimum(
            jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
            jnp.maximum(t1z, t2z),
        )
        # The LINE (not the ray) must meet the box — the coverage sigmoid
        # sees line distance — and the box's line interval must not end
        # beyond the behind-camera sigmoid's underflow width (member hit
        # points lie inside the box, so their t <= tf). The gr2 >= 0 term
        # rejects all-pad chunks explicitly: the slab min/max sort turns
        # their inverted box into accept-all, it cannot encode emptiness.
        return (
            (w > 0.0) & (tn <= tf)
            & (tf > -_GATE_T_MARGIN * tau_eff)
            & (gate["gr2"][c] >= 0.0)
        )
    gcx, gcy, gcz = gate["gcx"][c], gate["gcy"][c], gate["gcz"][c]
    s_g = dx * gcx + dy * gcy + dz * gcz
    ogc = ox * gcx + oy * gcy + oz * gcz
    tc = s_g - do  # closest-approach parameter on the full line (unit d)
    dist2 = oo - 2.0 * ogc + gate["gg"][c] + tc * (2.0 * (do - s_g) + tc)
    behind_ok = tc + gate["gsm"][c] > -_GATE_T_MARGIN * tau_eff
    return (w > 0.0) & (dist2 <= gate["gr2"][c]) & behind_ok


def _fold_ref(t_ref, alpha, t):
    return jnp.minimum(t_ref, jnp.where(alpha > _ALPHA_REF, t, _FAR))


def _soft_t_ref(tbls, sread, gate, rays6, geom, cnt):
    """Hard front depth per ray — the stop-gradiented softmax anchor
    (mirrors trace_soft pass 1). Gated chunks have alpha == 0 < _ALPHA_REF
    for every member, so skipping them is exact."""
    from raytracer_tpu.diff.soft import (
        _box_alpha_t_scalar,
        _sphere_alpha_t_scalar,
        _wall_alpha_t_scalar,
    )

    tau = tbls["z_tau"][0]
    o = V3(rays6[0], rays6[1], rays6[2])
    d = V3(rays6[3], rays6[4], rays6[5])
    t_ref0 = (o.x + d.x) * 0.0 + _FAR
    n_chunks = cnt["n_s_pad"] // _SOFT_CHUNK

    def chunk_body(c, t_ref):
        def do_chunk(tr):
            for u in range(_SOFT_CHUNK):
                idx = c * _SOFT_CHUNK + u
                p = {k: sread(k, idx) for k in ("cx", "cy", "cz", "r")}
                alpha, t, _, _ = _sphere_alpha_t_scalar(p, o, d, tau)
                tr = _fold_ref(tr, alpha, t)
            return tr

        if not _SOFT_TUBE_GATE:
            return do_chunk(t_ref)
        reach = _chunk_reachable(gate, c, rays6, geom, tau, n_chunks)
        return jax.lax.cond(jnp.any(reach), do_chunk, lambda tr: tr, t_ref)

    t_ref = jax.lax.fori_loop(0, n_chunks, chunk_body, t_ref0)
    for i in range(cnt["n_w"]):
        p = {k: tbls["w_" + k][i] for k in _WALL_GEO_KEYS}
        alpha, t, _, _ = _wall_alpha_t_scalar(p, o, d, tau)
        t_ref = _fold_ref(t_ref, alpha, t)
    for i in range(cnt["n_b"]):
        p = {k: tbls["b_" + k][i] for k in _BOX_GEO_KEYS}
        alpha, t, _, _ = _box_alpha_t_scalar(p, o, d, tau)
        t_ref = _fold_ref(t_ref, alpha, t)
    return t_ref


def _contrib_of(alpha, t, point, n, col, met, t_ref, tau_z, *, is_last):
    """diff/soft.py `fold_in`'s additive increments for one primitive:
    ``(e, e * payload..., log1p(1 - alpha))`` — linear-space depth softmax,
    bounded logits."""
    e = alpha * jnp.exp(-jnp.maximum(t - t_ref, 0.0) / tau_z)
    if is_last:
        pay = (col.x, col.y, col.z)
    else:
        pay = (col.x, col.y, col.z,
               col.x * met, col.y * met, col.z * met, met,
               point.x, point.y, point.z, n.x, n.y, n.z)
    return (e,) + tuple(q * e for q in pay) + (
        jnp.log1p(-jnp.minimum(alpha, 1.0 - 1e-7)),
    )


def _sphere_contrib(lts, tau, tau_z, p, rays6, t_ref, *, is_last: bool):
    """Sphere (p)'s contribution from its 12 traced scalars. The backward
    `jax.vjp`s THIS per sphere, so only one sphere's intermediates are
    ever live (Mosaic cannot lower remat2, and a whole-loop vjp's
    residuals overflow VMEM: measured 19.9 MB at an (8, 128) tile for 64
    spheres)."""
    from raytracer_tpu.diff.soft import (
        _shade_point_scalar,
        _sphere_alpha_t_scalar,
    )

    o = V3(rays6[0], rays6[1], rays6[2])
    d = V3(rays6[3], rays6[4], rays6[5])
    alpha, t, point, n = _sphere_alpha_t_scalar(p, o, d, tau)
    col = _shade_point_scalar(
        point, n, -d, V3(p["colr"], p["colg"], p["colb"]),
        p["amb"], p["kd"], p["ks"], p["exp"], lts[0], lts[1],
    )
    return _contrib_of(alpha, t, point, n, col, p["met"], t_ref, tau_z,
                       is_last=is_last)


def _wb_contrib(tbls, rays6, t_ref, kind: str, i: int, *, cnt,
                is_last: bool):
    """Wall/box (kind, i)'s contribution from the shared tables (these are
    few; they stay statically unrolled)."""
    from raytracer_tpu.diff.soft import (
        _box_alpha_t_scalar,
        _shade_point_scalar,
        _wall_alpha_t_scalar,
    )

    tau, tau_z = tbls["z_tau"][0], tbls["z_tau_z"][0]
    o = V3(rays6[0], rays6[1], rays6[2])
    d = V3(rays6[3], rays6[4], rays6[5])
    lts = _lights_of(tbls, cnt)
    if kind == "w":
        p = {k: tbls["w_" + k][i] for k in _WALL_GEO_KEYS + _MAT_KEYS}
        alpha, t, point, n = _wall_alpha_t_scalar(p, o, d, tau)
    else:
        p = {k: tbls["b_" + k][i] for k in _BOX_GEO_KEYS + _MAT_KEYS}
        alpha, t, point, n = _box_alpha_t_scalar(p, o, d, tau)
    col = _shade_point_scalar(
        point, n, -d, V3(p["colr"], p["colg"], p["colb"]),
        p["amb"], p["kd"], p["ks"], p["exp"], lts[0], lts[1],
    )
    return _contrib_of(alpha, t, point, n, col, p["met"], t_ref, tau_z,
                       is_last=is_last)


def _zero_carry(w, is_last: bool):
    zero = w * 0.0
    n_pay = 3 if is_last else 13
    return (zero,) + (zero,) * n_pay + (zero,)


def _soft_stream_sums(tbls, sread, gate, rays6, geom, w, t_ref, *, cnt,
                      is_last: bool):
    """The composite carry (s, payload sums, log_transmit): sphere chunks
    stream through the gated fori_loop (same composite order as
    trace_soft: spheres, then walls, then boxes — x + 0.0 is exact in f32,
    so gated skips never perturb the sums)."""
    tau, tau_z = tbls["z_tau"][0], tbls["z_tau_z"][0]
    lts = _lights_of(tbls, cnt)
    n_chunks = cnt["n_s_pad"] // _SOFT_CHUNK
    carry0 = _zero_carry(w, is_last)

    def chunk_body(c, carry):
        def do_chunk(cr):
            from raytracer_tpu.diff.soft import _sphere_alpha_t_scalar

            o_v = V3(rays6[0], rays6[1], rays6[2])
            d_v = V3(rays6[3], rays6[4], rays6[5])
            for u in range(_SOFT_CHUNK):
                idx = c * _SOFT_CHUNK + u
                p = {k: sread(k, idx) for k in _SPH_KEYS}
                if _SOFT_SPHERE_GATE:
                    alpha, _, _, _ = _sphere_alpha_t_scalar(p, o_v, d_v, tau)

                    def add_contrib(cr, p=p):
                        contrib = _sphere_contrib(
                            lts, tau, tau_z, p, rays6, t_ref,
                            is_last=is_last,
                        )
                        return tuple(a + v for a, v in zip(cr, contrib))

                    cr = jax.lax.cond(
                        jnp.any(alpha > 0.0), add_contrib, lambda cr: cr, cr
                    )
                else:
                    contrib = _sphere_contrib(
                        lts, tau, tau_z, p, rays6, t_ref, is_last=is_last
                    )
                    cr = tuple(a + v for a, v in zip(cr, contrib))
            return cr

        if not _SOFT_TUBE_GATE:
            return do_chunk(carry)
        reach = _chunk_reachable(gate, c, rays6, geom, tau, n_chunks)
        return jax.lax.cond(jnp.any(reach), do_chunk, lambda cr: cr, carry)

    carry = jax.lax.fori_loop(0, n_chunks, chunk_body, carry0)
    for kind, n in (("w", cnt["n_w"]), ("b", cnt["n_b"])):
        for i in range(n):
            contrib = _wb_contrib(
                tbls, rays6, t_ref, kind, i, cnt=cnt, is_last=is_last
            )
            carry = tuple(a + v for a, v in zip(carry, contrib))
    return carry


def _soft_post(tbls, carry, rays6, w, *, cnt, is_last: bool):
    """The composite tail: coverage/softmax normalization, sky blend,
    accumulator increment, expected-surface reflection."""
    tau = tbls["z_tau"][0]
    sky_s = tbls["z_sky"]
    d = V3(rays6[3], rays6[4], rays6[5])
    zero = w * 0.0
    s = carry[0]
    log_transmit = carry[-1]
    coverage = 1.0 - jnp.exp(log_transmit)
    inv_s = 1.0 / jnp.maximum(s, 1e-12)  # see diff/soft.py clamp rationale

    # sky (mirrors background_soa; same 10-scalar packing as _level_math)
    z = d.z
    z_pos = jnp.where(z > 0.0, z, 1.0)
    grad = jnp.where(z > 0.0, jnp.exp(sky_s[9] * jnp.log(z_pos)), 0.0)
    skr = jnp.where(z < 0.0, sky_s[6], sky_s[0] + (sky_s[3] - sky_s[0]) * grad)
    skg = jnp.where(z < 0.0, sky_s[7], sky_s[1] + (sky_s[4] - sky_s[1]) * grad)
    skb = jnp.where(z < 0.0, sky_s[8], sky_s[2] + (sky_s[5] - sky_s[2]) * grad)

    if is_last:
        cr, cg, cb = carry[1:4]
        lr = cr * inv_s * coverage + skr * (1.0 - coverage)
        lg = cg * inv_s * coverage + skg * (1.0 - coverage)
        lb = cb * inv_s * coverage + skb * (1.0 - coverage)
        return (w * lr, w * lg, w * lb, zero,
                rays6[0], rays6[1], rays6[2], rays6[3], rays6[4], rays6[5])

    (cr, cg, cb, cmr, cmg, cmb, cmet,
     cpx, cpy, cpz, cnx, cny, cnz) = carry[1:14]
    lr = (cr - cmr) * inv_s * coverage + skr * (1.0 - coverage)
    lg = (cg - cmg) * inv_s * coverage + skg * (1.0 - coverage)
    lb = (cb - cmb) * inv_s * coverage + skb * (1.0 - coverage)
    m_hat = cmet * inv_s
    p_hat = V3(cpx, cpy, cpz) * inv_s
    n_hat = (V3(cnx, cny, cnz) * inv_s).normalized(eps=1e-12)
    refl_o = p_hat + n_hat * jnp.maximum(_REFLECT_EPS, 6.0 * tau)
    refl_d = V3(rays6[3], rays6[4], rays6[5]).reflect(n_hat)
    w_next = w * (m_hat * coverage)
    return (w * lr, w * lg, w * lb, w_next,
            refl_o.x, refl_o.y, refl_o.z, refl_d.x, refl_d.y, refl_d.z)


# ---------------------------------------------------------------------------
# Kernels
# ---------------------------------------------------------------------------


def _n_carry(is_last: bool) -> int:
    """Carry planes: (s, payload sums, log_transmit)."""
    return 5 if is_last else 15


def _kernel_soft_level(keys, sizes, cnt, is_last: bool,
                       emit_res: bool = False):
    n_tbl = len(keys)
    n_ref = n_tbl + len(_SPH_KEYS) + len(_GATE_KEYS)
    n_carry = _n_carry(is_last)

    def kernel(*refs):
        tbls = _tbls_from(lambda k, i: refs[keys.index(k)][i], sizes)
        sph = {k: refs[n_tbl + j] for j, k in enumerate(_SPH_KEYS)}
        gate = {
            k: refs[n_tbl + len(_SPH_KEYS) + j]
            for j, k in enumerate(_GATE_KEYS)
        }
        (ox, oy, oz, dx, dy, dz, w_in, ar_in, ag_in, ab_in) = refs[
            n_ref:n_ref + 10
        ]
        (ar_ref, ag_ref, ab_ref, w_ref,
         nox_ref, noy_ref, noz_ref, ndx_ref, ndy_ref, ndz_ref) = refs[
            n_ref + 10:n_ref + 20
        ]
        rays6 = (ox[:], oy[:], oz[:], dx[:], dy[:], dz[:])
        w = w_in[:]
        geom = _tile_geom(rays6, w)
        sread = lambda k, i: sph[k][i]
        t_ref = _soft_t_ref(tbls, sread, gate, rays6, geom, cnt)
        carry = _soft_stream_sums(
            tbls, sread, gate, rays6, geom, w, t_ref, cnt=cnt,
            is_last=is_last,
        )
        outs = _soft_post(tbls, carry, rays6, w, cnt=cnt, is_last=is_last)
        ar_ref[:] = ar_in[:] + outs[0]
        ag_ref[:] = ag_in[:] + outs[1]
        ab_ref[:] = ab_in[:] + outs[2]
        w_ref[:] = outs[3]
        for ref, v in zip(
            (nox_ref, noy_ref, noz_ref, ndx_ref, ndy_ref, ndz_ref), outs[4:]
        ):
            ref[:] = v
        if emit_res:
            # TRAINING forward: stream out the anchor depth + composite
            # carry so the backward kernel consumes them instead of
            # replaying the two gated sphere sweeps (round 5; the hard
            # path's zero-forward-replay property, ~1 forward's worth of
            # sphere work removed from every backward level).
            res_refs = refs[n_ref + 20:]
            assert len(res_refs) == 1 + n_carry, (len(res_refs), n_carry)
            res_refs[0][:] = t_ref
            for ref, v in zip(res_refs[1:], carry):
                ref[:] = v

    return kernel


def _merge_light_tau_cts(ct_tbls, ct_lts, ct_tau, ct_tau_z, cnt):
    """Fold the sphere loop's light/tau cotangents (accumulated as their
    own small trees) back into the shared-table cotangent tree."""
    out = dict(ct_tbls)
    pt_keys = ("l_px", "l_py", "l_pz", "l_cr", "l_cg", "l_cb")
    sun_keys = ("l_sdx", "l_sdy", "l_sdz", "l_scr", "l_scg", "l_scb")
    for j in range(cnt["n_pt"]):
        for q, k in enumerate(pt_keys):
            t = list(out[k])
            t[j] = t[j] + ct_lts[0][j][q]
            out[k] = tuple(t)
    for j in range(cnt["n_sun"]):
        for q, k in enumerate(sun_keys):
            t = list(out[k])
            t[j] = t[j] + ct_lts[1][j][q]
            out[k] = tuple(t)
    out["z_tau"] = (out["z_tau"][0] + ct_tau,)
    out["z_tau_z"] = (out["z_tau_z"][0] + ct_tau_z,)
    return out


def _kernel_soft_level_bwd(keys, sizes, cnt, is_last: bool, ct_rows: int):
    n_tbl = len(keys)
    n_ref = n_tbl + len(_SPH_KEYS) + len(_GATE_KEYS)
    n_chunks = cnt["n_s_pad"] // _SOFT_CHUNK
    n_planes = _sct_planes(cnt["n_s_pad"])
    # per-key lane-slot planes, n_planes (8, 128) each (plane-minor order)
    sct_rows = len(_SPH_KEYS) * 8 * n_planes
    n_carry = _n_carry(is_last)

    def kernel(*refs):
        tbls = _tbls_from(lambda k, i: refs[keys.index(k)][i], sizes)
        sph = {k: refs[n_tbl + j] for j, k in enumerate(_SPH_KEYS)}
        gate = {
            k: refs[n_tbl + len(_SPH_KEYS) + j]
            for j, k in enumerate(_GATE_KEYS)
        }
        (ox, oy, oz, dx, dy, dz, w_in) = refs[n_ref:n_ref + 7]
        tref_in = refs[n_ref + 7]
        carry_in = refs[n_ref + 8:n_ref + 8 + n_carry]
        (car, cag, cab, cnox, cnoy, cnoz, cndx, cndy, cndz, cwn) = refs[
            n_ref + 8 + n_carry:n_ref + 18 + n_carry
        ]
        (cox_ref, coy_ref, coz_ref, cdx_ref, cdy_ref, cdz_ref, cw_ref,
         pct_ref, sct_ref) = refs[n_ref + 18 + n_carry:]
        rays6 = (ox[:], oy[:], oz[:], dx[:], dy[:], dz[:])
        w = w_in[:]
        geom = _tile_geom(rays6, w)
        sread = lambda k, i: sph[k][i]
        tau = tbls["z_tau"][0]
        tau_z = tbls["z_tau_z"][0]
        lts = _lights_of(tbls, cnt)
        cts = (car[:], cag[:], cab[:], cwn[:],
               cnox[:], cnoy[:], cnoz[:], cndx[:], cndy[:], cndz[:])

        # Streaming reverse sweep (manual outer transpose): (1) read the
        # anchor depth + composite carry from the forward's residual
        # planes (round 5 — previously REPLAYED here, two full gated
        # sphere sweeps per backward level), (2) vjp the composite tail
        # for the carry cotangent, (3) vjp each primitive's contribution
        # independently — the carry is a plain sum, so the sum's cotangent
        # IS each contribution's cotangent. Per-primitive residuals die
        # immediately; the live set is O(1 primitive). Gated chunks'
        # cotangents are exact zeros (module docstring), so the same cond
        # skips their vjps.
        t_ref = tref_in[:]
        carry = tuple(c[:] for c in carry_in)

        def post_f(tbls_t, carry_t, rays_t, w_t):
            return _soft_post(
                tbls_t, carry_t, rays_t, w_t, cnt=cnt, is_last=is_last
            )

        _, vjp_post = jax.vjp(post_f, tbls, carry, rays6, w)
        ct_tbls, ct_carry, ct_rays, ct_w = vjp_post(cts)

        add = lambda a, b: jax.tree_util.tree_map(jnp.add, a, b)

        # Walls/boxes: static per-primitive vjps into the shared ct tree.
        for kind, n in (("w", cnt["n_w"]), ("b", cnt["n_b"])):
            for i in range(n):
                def contrib_f(tbls_t, rays_t, kind=kind, i=i):
                    return _wb_contrib(
                        tbls_t, rays_t, t_ref, kind, i, cnt=cnt,
                        is_last=is_last,
                    )

                _, vjp_c = jax.vjp(contrib_f, tbls, rays6)
                ct_tbls_i, ct_rays_i = vjp_c(ct_carry)
                ct_tbls = add(ct_tbls, ct_tbls_i)
                ct_rays = add(ct_rays, ct_rays_i)

        # Spheres: gated chunk loop; per-sphere vjp w.r.t. exactly the
        # scalars it consumes. Sphere cotangents land in per-key lane-slot
        # accumulators — n_planes (8, 128) planes per key, sphere i ->
        # plane i // _SLOT_CAP, row/lane from i % _SLOT_CAP — so the
        # traced-index scatter is 12 x n_planes cheap selects per sphere
        # and the layout scales past the old 1024-sphere cliff (VERDICT r4
        # item 3).
        row_io = jax.lax.broadcasted_iota(jnp.int32, (8, _SL_C), 0)
        lane_io = jax.lax.broadcasted_iota(jnp.int32, (8, _SL_C), 1)
        zs = jnp.zeros((), jnp.float32)  # strongly-typed: fori carries must
        zero_ct_lts = jax.tree_util.tree_map(lambda _: zs, lts)
        zslot = jnp.zeros((8, _SL_C), jnp.float32)
        state0 = (
            ct_rays,
            zero_ct_lts,
            zs,  # ct tau
            zs,  # ct tau_z
            tuple(zslot for _ in range(len(_SPH_KEYS) * n_planes)),
        )

        def scatter_sphere(slots, idx, ct_p_i):
            slot_i = idx % _SLOT_CAP
            hit = (
                (row_io == slot_i // _SL_C)
                & (lane_io == slot_i % _SL_C)
            )
            plane_i = idx // _SLOT_CAP
            # n_planes distinct masks, shared across the 12 keys.
            sels = [hit & (plane_i == pn) for pn in range(n_planes)]
            slots = list(slots)
            for j, k in enumerate(_SPH_KEYS):
                for pn in range(n_planes):
                    si = j * n_planes + pn
                    slots[si] = jnp.where(
                        sels[pn], slots[si] + ct_p_i[k], slots[si]
                    )
            return tuple(slots)

        def chunk_body(c, state):
            def do_chunk_batched(st):
                # ONE vjp over the summed 8-sphere chunk contribution:
                # the carry is a plain sum, so the chunk sum's cotangent
                # is still ct_carry; residuals for 8 spheres stay well
                # inside the scoped-VMEM budget (the r4 overflow was the
                # whole-SCENE loop, pre-streaming).
                ct_r, ct_l, ct_t, ct_tz, slots = st
                plist = tuple(
                    {k: sread(k, c * _SOFT_CHUNK + u) for k in _SPH_KEYS}
                    for u in range(_SOFT_CHUNK)
                )

                def chunk_f(lts_t, tau_t, tau_z_t, ps_t, rays_t):
                    outs = None
                    for p_t in ps_t:
                        cb = _sphere_contrib(
                            lts_t, tau_t, tau_z_t, p_t, rays_t, t_ref,
                            is_last=is_last,
                        )
                        outs = cb if outs is None else tuple(
                            a + b for a, b in zip(outs, cb)
                        )
                    return outs

                _, vjp_c = jax.vjp(chunk_f, lts, tau, tau_z, plist, rays6)
                ct_l_i, ct_t_i, ct_tz_i, ct_ps, ct_r_i = vjp_c(ct_carry)
                ct_r = add(ct_r, ct_r_i)
                ct_l = add(ct_l, ct_l_i)
                ct_t = ct_t + ct_t_i
                ct_tz = ct_tz + ct_tz_i
                for u in range(_SOFT_CHUNK):
                    slots = scatter_sphere(
                        slots, c * _SOFT_CHUNK + u, ct_ps[u]
                    )
                return ct_r, ct_l, ct_t, ct_tz, slots

            def do_chunk_streamed(st):
                ct_r, ct_l, ct_t, ct_tz, slots = st
                for u in range(_SOFT_CHUNK):
                    idx = c * _SOFT_CHUNK + u
                    p = {k: sread(k, idx) for k in _SPH_KEYS}

                    def contrib_f(lts_t, tau_t, tau_z_t, p_t, rays_t):
                        return _sphere_contrib(
                            lts_t, tau_t, tau_z_t, p_t, rays_t, t_ref,
                            is_last=is_last,
                        )

                    _, vjp_c = jax.vjp(contrib_f, lts, tau, tau_z, p, rays6)
                    ct_l_i, ct_t_i, ct_tz_i, ct_p_i, ct_r_i = vjp_c(ct_carry)
                    ct_r = add(ct_r, ct_r_i)
                    ct_l = add(ct_l, ct_l_i)
                    ct_t = ct_t + ct_t_i
                    ct_tz = ct_tz + ct_tz_i
                    slots = scatter_sphere(slots, idx, ct_p_i)
                return ct_r, ct_l, ct_t, ct_tz, slots

            do_chunk = (
                do_chunk_batched if _SOFT_CHUNK_VJP else do_chunk_streamed
            )

            if not _SOFT_TUBE_GATE:
                return do_chunk(state)
            reach = _chunk_reachable(gate, c, rays6, geom, tau, n_chunks)
            return jax.lax.cond(jnp.any(reach), do_chunk, lambda st: st,
                                state)

        ct_rays, ct_lts, ct_tau, ct_tau_z, slots = jax.lax.fori_loop(
            0, n_chunks, chunk_body, state0
        )
        ct_tbls = _merge_light_tau_cts(ct_tbls, ct_lts, ct_tau, ct_tau_z, cnt)

        for ref, v in zip(
            (cox_ref, coy_ref, coz_ref, cdx_ref, cdy_ref, cdz_ref), ct_rays
        ):
            ref[:] = v
        cw_ref[:] = ct_w

        # Pack the shared-scalar cotangents (tree-leaf order == sorted-key
        # x element order == the host unpack's order) into one
        # (ct_rows, 128) per-tile block.
        leaves = jax.tree_util.tree_leaves(ct_tbls)
        block = jnp.zeros((ct_rows, _SL_C), jnp.float32)
        row = jax.lax.broadcasted_iota(jnp.int32, (ct_rows, _SL_C), 0)
        lane = jax.lax.broadcasted_iota(jnp.int32, (ct_rows, _SL_C), 1)
        for pos, v in enumerate(leaves):
            block = jnp.where(
                (row == pos // _SL_C) & (lane == pos % _SL_C), v, block
            )
        pct_ref[0, 0] = block
        for si in range(len(_SPH_KEYS) * n_planes):
            sct_ref[0, 0, si * 8:(si + 1) * 8, :] = slots[si]

    return kernel, sct_rows


def _ct_rows(sizes: dict) -> int:
    total = sum(sizes.values())
    return max(8, -(-total // _SL_C))


@functools.partial(
    jax.jit, static_argnames=("keys", "sizes_t", "cnt_t", "is_last", "sl_r",
                              "emit_res", "interpret"),
)
def _soft_level(arrs_list, sph_list, gate_list, rays, state, *, keys,
                sizes_t, cnt_t, is_last: bool, sl_r: int,
                emit_res: bool = False, interpret: bool):
    sizes, cnt = dict(sizes_t), dict(cnt_t)
    h, w = rays[0].shape
    grid = (h // sl_r, w // _SL_C)
    spec = pl.BlockSpec(
        (sl_r, _SL_C), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
    )
    n_out = 10 + ((1 + _n_carry(is_last)) if emit_res else 0)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(keys) + len(_SPH_KEYS) + len(_GATE_KEYS),
        grid=grid,
        in_specs=[spec] * 10,
        out_specs=(spec,) * n_out,
    )
    f32 = _out_struct((h, w), jnp.float32, rays[0])
    return pl.pallas_call(
        _kernel_soft_level(keys, sizes, cnt, is_last, emit_res),
        out_shape=(f32,) * n_out,
        grid_spec=grid_spec,
        interpret=interpret,
    )(*arrs_list, *sph_list, *gate_list, *rays, *state)


@functools.partial(
    jax.jit, static_argnames=("keys", "sizes_t", "cnt_t", "is_last", "sl_r",
                              "interpret"),
)
def _soft_level_bwd(arrs_list, sph_list, gate_list, level_in, res_in,
                    ct_acc, ct_next, *, keys, sizes_t, cnt_t,
                    is_last: bool, sl_r: int, interpret: bool):
    sizes, cnt = dict(sizes_t), dict(cnt_t)
    h, w = level_in[0].shape
    grid = (h // sl_r, w // _SL_C)
    th, tw = grid
    rows = _ct_rows(sizes)
    kernel, sct_rows = _kernel_soft_level_bwd(keys, sizes, cnt, is_last,
                                              rows)
    spec = pl.BlockSpec(
        (sl_r, _SL_C), lambda i, j, *_: (i, j), memory_space=pltpu.VMEM
    )
    pct_spec = pl.BlockSpec(
        (1, 1, rows, _SL_C), lambda i, j, *_: (i, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    sct_spec = pl.BlockSpec(
        (1, 1, sct_rows, _SL_C), lambda i, j, *_: (i, j, 0, 0),
        memory_space=pltpu.VMEM,
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=len(keys) + len(_SPH_KEYS) + len(_GATE_KEYS),
        grid=grid,
        in_specs=[spec] * (18 + _n_carry(is_last)),
        out_specs=(spec,) * 7 + (pct_spec, sct_spec),
    )
    f32 = _out_struct((h, w), jnp.float32, level_in[0])
    return pl.pallas_call(
        kernel,
        out_shape=(f32,) * 7
        + (_out_struct((th, tw, rows, _SL_C), jnp.float32, level_in[0]),
           _out_struct((th, tw, sct_rows, _SL_C), jnp.float32,
                       level_in[0])),
        grid_spec=grid_spec,
        # Mosaic's stack allocator does not reuse buffers across the
        # unrolled per-primitive vjp sequence well; the default 16 MB
        # scoped-vmem budget overflows even though the true live set is
        # one primitive's residuals. Raise the cap (v5e hardware headroom
        # permitting) rather than shrinking tiles below the (8, 128) f32
        # minimum.
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_SOFT_BWD_VMEM_LIMIT
        ),
        interpret=interpret,
    )(*arrs_list, *sph_list, *gate_list, *level_in, *res_in,
      *ct_acc, *ct_next)


# ---------------------------------------------------------------------------
# Whole-trace orchestration + custom VJP
# ---------------------------------------------------------------------------


def _split_keys(arrs: dict):
    """(shared keys sorted, sphere arrays in _SPH_KEYS order)."""
    keys_sh = tuple(sorted(k for k in arrs if not k.startswith("s_")))
    sph_list = [arrs["s_" + k] for k in _SPH_KEYS]
    return keys_sh, sph_list


def _prep_rays(o: V3, d: V3, sl_r: int):
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
    w_live = jnp.ones((h, w), jnp.float32)
    if hp != h or wp != w:
        w_live = jnp.pad(w_live, ((0, hp - h), (0, wp - w)))
    return rays, w_live, (h, w, hp, wp)


def _soft_levels_impl(scene: Scene, o: V3, d: V3, tau, tau_z, *, depth: int,
                      interpret: bool | None = None,
                      with_residuals: bool = False):
    if interpret is None:
        interpret = not pallas_available()
    sl_r = _SOFT_SL_R
    n_s_pad = _n_s_pad(scene)
    arrs = _soft_param_arrays(scene, tau, tau_z, n_s_pad)
    keys, sph_list = _split_keys(arrs)
    sizes_t = tuple((k, int(arrs[k].shape[0])) for k in keys)
    cnt_t = tuple(sorted(_counts(scene, n_s_pad).items()))
    arrs_list = [arrs[k] for k in keys]
    gate_list = _soft_gate_arrays(scene, tau, n_s_pad)

    rays, w_live, dims = _prep_rays(o, d, sl_r)
    h, w, hp, wp = dims
    zero = jnp.zeros((hp, wp), jnp.float32)
    state = (w_live, zero, zero, zero)

    rays_levels, w_levels, res_levels = [], [], []
    for k in range(depth + 1):
        if with_residuals:
            rays_levels.append(rays)
            w_levels.append(state[0])
        outs = _soft_level(
            arrs_list, sph_list, gate_list, rays, state, keys=keys,
            sizes_t=sizes_t, cnt_t=cnt_t, is_last=(k == depth), sl_r=sl_r,
            emit_res=with_residuals, interpret=interpret,
        )
        state = (outs[3], outs[0], outs[1], outs[2])
        rays = tuple(outs[4:10])
        if with_residuals:
            # (t_ref, carry planes): the backward reads these instead of
            # replaying the two gated sphere sweeps (round 5).
            res_levels.append(tuple(outs[10:]))

    _, ar, ag, ab = state
    if hp != h or wp != w:
        ar, ag, ab = ar[:h, :w], ag[:h, :w], ab[:h, :w]
    acc = V3(ar, ag, ab)
    if with_residuals:
        return acc, rays_levels, w_levels, res_levels
    return acc


def _soft_levels_bwd_impl(scene: Scene, tau, tau_z, rays_levels, w_levels,
                          res_levels, ct_acc: V3, *, depth: int,
                          interpret: bool | None = None):
    if interpret is None:
        interpret = not pallas_available()
    sl_r = _SOFT_SL_R_BWD
    if _SOFT_SL_R % sl_r != 0:
        raise ValueError(
            f"RT_SOFT_SL_R_BWD={sl_r} must divide RT_SOFT_SL_R={_SOFT_SL_R} "
            "(the backward re-tiles the forward's padded planes)"
        )
    n_s_pad = _n_s_pad(scene)
    sg = jax.lax.stop_gradient

    arrs, vjp_arrs = jax.vjp(
        lambda sc, t1, t2: _soft_param_arrays(sc, t1, t2, n_s_pad),
        scene, tau, tau_z,
    )
    keys, sph_list = _split_keys(arrs)
    sizes = {k: int(arrs[k].shape[0]) for k in keys}
    sizes_t = tuple(sizes.items())
    cnt_t = tuple(sorted(_counts(scene, n_s_pad).items()))
    arrs_list = [sg(arrs[k]) for k in keys]
    sph_list = [sg(a) for a in sph_list]
    gate_list = _soft_gate_arrays(scene, tau, n_s_pad)

    hp, wp = rays_levels[0][0].shape
    h, w = ct_acc.x.shape

    def prep_ct(c):
        c = jnp.asarray(c, jnp.float32)
        if hp != h or wp != w:
            c = jnp.pad(c, ((0, hp - h), (0, wp - w)))
        return c

    ct3 = (prep_ct(ct_acc.x), prep_ct(ct_acc.y), prep_ct(ct_acc.z))
    zero = jnp.zeros((hp, wp), jnp.float32)
    ct_next = (zero,) * 7  # d(next rays6, next w): nothing past the last
    rows = _ct_rows(sizes)
    n_planes = _sct_planes(n_s_pad)
    pct_sum = jnp.zeros((rows * _SL_C,), jnp.float32)
    sct_sum = jnp.zeros(
        (len(_SPH_KEYS) * 8 * n_planes, _SL_C), jnp.float32
    )
    for k in reversed(range(depth + 1)):
        level_in = rays_levels[k] + (w_levels[k],)
        outs = _soft_level_bwd(
            arrs_list, sph_list, gate_list, level_in, res_levels[k],
            ct3, ct_next,
            keys=keys, sizes_t=sizes_t, cnt_t=cnt_t, is_last=(k == depth),
            sl_r=sl_r, interpret=interpret,
        )
        ct_rays = outs[0:6]
        ct_w = outs[6]
        pct_sum = pct_sum + outs[7].sum(axis=(0, 1)).reshape(-1)
        sct_sum = sct_sum + outs[8].sum(axis=(0, 1))
        ct_next = ct_rays + (ct_w,)

    # Unpack: shared flat vector -> per-key arrays (same key x element
    # order the kernel packed); sphere lane-slot planes -> per-key arrays;
    # then transpose through _soft_param_arrays.
    ct_arrs = {}
    pos = 0
    for k in keys:
        n = sizes[k]
        ct_arrs[k] = jax.lax.dynamic_slice_in_dim(pct_sum, pos, n)
        pos += n
    for j, k in enumerate(_SPH_KEYS):
        parts = []
        for pn in range(n_planes):
            base = (j * n_planes + pn) * 8
            parts.append(sct_sum[base:base + 8].reshape(-1)[:_SLOT_CAP])
        block = parts[0] if n_planes == 1 else jnp.concatenate(parts)
        ct_arrs["s_" + k] = block[:n_s_pad]
    scene_ct, ct_tau, ct_tau_z = vjp_arrs(ct_arrs)

    def crop(c):
        return c[:h, :w] if (hp != h or wp != w) else c

    ct_o = V3(crop(ct_rays[0]), crop(ct_rays[1]), crop(ct_rays[2]))
    ct_d = V3(crop(ct_rays[3]), crop(ct_rays[4]), crop(ct_rays[5]))
    return scene_ct, ct_o, ct_d, ct_tau, ct_tau_z


def _unbroadcast(c, like):
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


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def soft_trace_pallas(scene, o, d, tau, tau_z, depth):
    """Whole soft trace as per-level Pallas megakernels with a megakernel
    backward — the TPU fast path of diff/soft.py `trace_soft`.

    Forward: one kernel per reflection level (t_ref anchor + gated
    chunk-streamed depth-softmax composite + expected-surface reflection,
    all in VMEM). Backward: one kernel per level in reverse, `jax.vjp`-ing
    the identical level function at the forward's saved rays/throughput;
    parameter cotangents reduce in-kernel to per-tile scalar blocks.
    """
    return _soft_levels_impl(scene, o, d, tau, tau_z, depth=depth)


def _soft_trace_fwd(scene, o, d, tau, tau_z, depth):
    acc, rays_levels, w_levels, res_levels = _soft_levels_impl(
        scene, o, d, tau, tau_z, depth=depth, with_residuals=True
    )
    return acc, (scene, o, d, tau, tau_z, rays_levels, w_levels, res_levels)


def _soft_trace_bwd(depth, res, ct):
    scene, o, d, tau, tau_z, rays_levels, w_levels, res_levels = res
    scene_ct, ct_o, ct_d, ct_tau, ct_tau_z = _soft_levels_bwd_impl(
        scene, tau, tau_z, rays_levels, w_levels, res_levels, ct, depth=depth
    )
    ct_o = V3(_unbroadcast(ct_o.x, o.x), _unbroadcast(ct_o.y, o.y),
              _unbroadcast(ct_o.z, o.z))
    ct_d = V3(_unbroadcast(ct_d.x, d.x), _unbroadcast(ct_d.y, d.y),
              _unbroadcast(ct_d.z, d.z))
    return scene_ct, ct_o, ct_d, ct_tau, ct_tau_z


soft_trace_pallas.defvjp(_soft_trace_fwd, _soft_trace_bwd)
