"""Soft (relaxed) visibility rendering for gradient-based geometry fitting.

The hard renderer's argmin visibility has zero gradient at silhouettes: a
sphere's *edge* never moves under ``jax.grad``, so fitting sphere centers to
a target image stalls (SURVEY.md §7 hard part #1). This module is the
differentiable path BASELINE.json requires — a temperature-controlled
relaxation of the intersection/occlusion pipeline:

* **coverage** ``alpha_i``: each primitive's hard hit test becomes a sigmoid
  in its decision quantity — the sphere discriminant ``B^2 - C``
  (scene.cpp:47-53 made smooth) and the wall's rectangle bounds
  (scene.cpp:29) — times a behind-camera cut;
* **occlusion**: the closest-hit argmin (main.cpp:67-84) becomes a softmax
  over *relative* depth ``-(t_i - t_ref)/tau_z``, where ``t_ref`` is the
  per-ray hard front depth computed in a first, stop-gradiented pass
  (anchoring depths keeps the softmax bounded for any scene scale);
* **background**: primitives union-composite with coverage
  ``A = 1 - prod(1 - alpha_i)`` over the sky (main.cpp:28-37);
* **shading**: full Blinn-Phong at each primitive's own soft hit point
  (same math as ops/trace.py), blended by the soft weights;
* **reflections** (``depth > 0``): the reference's recursive mirror blend
  ``lerp(local, reflected, metallic)`` (main.cpp:111-117) made smooth by
  aggregating ONE expected reflection ray per pixel: the same softmax
  weights that blend colors also blend hit points, normals and metallic
  into an expected surface, the ray mirrors about it (eps-offset origin,
  main.cpp:111), and the composite adds ``sum_i w_i local_i (1 - m_i) +
  m_hat * C_reflected``. As ``tau -> 0`` the weights become one-hot, the
  expected surface IS the winner's surface, and the recursion converges to
  the hard bounce loop (ops/trace.py trace_soa).

Both passes stream over primitives (flash-attention-style running
logsumexp), so memory is O(1) in primitive count. As ``tau -> 0`` the
output converges to the hard render; tests check that limit and agreement
of gradients with finite differences.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from raytracer_tpu.core.types import Camera, Lights, Scene
from raytracer_tpu.core.v3 import V3
from raytracer_tpu.ops.tonemap import reinhard_tonemap
from raytracer_tpu.ops.trace import (
    _light_terms,
    _wall_tables,
    background_soa,
    raygen_tile,
)

__all__ = ["trace_soft", "render_soft"]

_FAR = 1e4  # reference depth for rays that hit nothing
_ALPHA_REF = 0.3  # coverage needed to anchor the reference depth


def _sigmoid(x):
    return jax.nn.sigmoid(x)


def _shade_point_scalar(point: V3, normal: V3, view: V3, color: V3, amb, kd,
                        ks, exp, pt_lights, sun_lights):
    """Blinn-Phong at one primitive's soft hit point (main.cpp:102-104).

    ``pt_lights``/``sun_lights`` are tuples of per-light 6-scalar tuples
    (position/UNIT direction xyz + color rgb) — the form the Pallas soft
    kernels (ops/pallas_soft.py) read from their scalar-prefetch tables;
    `_shade_point` is the pytree-facing wrapper."""
    zeros = jnp.zeros_like(point.x)
    intensity = V3(zeros, zeros, zeros)
    for (lpx, lpy, lpz, lcr, lcg, lcb) in pt_lights:
        lp = V3(lpx, lpy, lpz)
        lc = V3(lcr, lcg, lcb)
        ldir = (lp - point).normalized(eps=1e-12)
        diff, spec = _light_terms(ldir, normal, view, exp)
        intensity = intensity + lc * (diff * kd + spec * ks)
    for (sdx, sdy, sdz, scr, scg, scb) in sun_lights:
        sun_col = V3(scr, scg, scb)
        ones = jnp.ones_like(point.x)
        sdir = V3(sdx * ones, sdy * ones, sdz * ones)
        sdiff, sspec = _light_terms(sdir, normal, view, exp)
        intensity = intensity + sun_col * (sdiff * kd + sspec * ks)
    return color * (intensity + amb)


def _shade_point(point: V3, normal: V3, view: V3, color: V3, amb, kd, ks, exp,
                 lights: Lights):
    """Blinn-Phong at one primitive's soft hit point (main.cpp:102-104)."""
    pt = tuple(
        (lights.point_position[li, 0], lights.point_position[li, 1],
         lights.point_position[li, 2], lights.point_color[li, 0],
         lights.point_color[li, 1], lights.point_color[li, 2])
        for li in range(lights.point_position.shape[0])
    )
    sun = []
    for si in range(lights.sun_color.shape[0]):  # [0,3] statically sunless
        sd = V3.from_stacked(lights.sun_direction[si]).normalized()
        sun.append((sd.x, sd.y, sd.z, lights.sun_color[si, 0],
                    lights.sun_color[si, 1], lights.sun_color[si, 2]))
    return _shade_point_scalar(point, normal, view, color, amb, kd, ks, exp,
                               pt, tuple(sun))


def _sphere_alpha_t(scene: Scene, i: int, o: V3, d: V3, tau: float):
    """(coverage, soft hit distance, hit point, normal) for sphere ``i``."""
    spheres = scene.spheres
    c = V3.from_stacked(spheres.center[i])
    r = spheres.radius[i]
    oc = o - c
    b_half = d.dot(oc)
    cc = oc.norm2() - r * r
    disc = b_half * b_half - cc  # > 0 inside the silhouette
    # Smooth continuation of the hit distance past the silhouette.
    # Double-where: sqrt'(0) is inf, so keep the sqrt argument away from 0
    # on the masked branch (0 * inf = NaN would poison reverse mode).
    pos = disc > 0.0
    sq = jnp.sqrt(jnp.where(pos, disc, 1.0))
    t = -b_half - jnp.where(pos, sq, 0.0)
    # Edge softness in world units: |d(disc)/d(perp dist)| at the rim ~ 2r.
    alpha = _sigmoid(disc / (tau * 2.0 * jnp.maximum(r, 1e-6)))
    alpha = alpha * _sigmoid(t / jnp.maximum(tau, 1e-6))  # behind-camera cut
    point = o + d * t
    # Normalize (don't just divide by r): off-silhouette continuation points
    # sit at distance rho >> r from the center, and a non-unit pseudo-normal
    # overflows the shading pow (base^50) to inf, which the alpha-masked
    # composite would turn into inf/NaN pixels.
    n = (point - c).normalized(eps=1e-12)
    return alpha, t, point, n


def _wall_alpha_t_scalar(p: dict, o: V3, d: V3, tau: float):
    """`_wall_alpha_t` from one wall's scalars (the Pallas-kernel form).

    ``p`` keys: nx ny nz dplane rx ry rz ux uy uz px py pz length width —
    one `_wall_tables` row."""
    denom = d.x * p["nx"] + d.y * p["ny"] + d.z * p["nz"]
    ok = jnp.abs(denom) > 1e-6
    t = (
        p["dplane"] - (o.x * p["nx"] + o.y * p["ny"] + o.z * p["nz"])
    ) / jnp.where(ok, denom, 1.0)
    point = o + d * t
    relx = point.x - p["px"]
    rely = point.y - p["py"]
    relz = point.z - p["pz"]
    u = relx * p["rx"] + rely * p["ry"] + relz * p["rz"]
    v = relx * p["ux"] + rely * p["uy"] + relz * p["uz"]
    alpha = (
        _sigmoid(u / tau)
        * _sigmoid((p["length"] - u) / tau)
        * _sigmoid(v / tau)
        * _sigmoid((p["width"] - v) / tau)
        * _sigmoid(t / jnp.maximum(tau, 1e-6))
        * ok.astype(jnp.float32)
    )
    n = V3(
        jnp.full_like(t, p["nx"]),
        jnp.full_like(t, p["ny"]),
        jnp.full_like(t, p["nz"]),
    )
    return alpha, t, point, n


def _wall_alpha_t(tab: dict, i: int, o: V3, d: V3, tau: float):
    """(coverage, hit distance, hit point, normal) for wall ``i``."""
    return _wall_alpha_t_scalar(
        {k: v[i] for k, v in tab.items()}, o, d, tau
    )


def _sphere_alpha_t_scalar(params, o: V3, d: V3, tau: float):
    """Same as ``_sphere_alpha_t`` but from a dict of per-sphere scalars
    (the chunk-scanned path; params: cx, cy, cz, r)."""
    c = V3(params["cx"], params["cy"], params["cz"])
    r = params["r"]
    oc = o - c
    b_half = d.dot(oc)
    cc = oc.norm2() - r * r
    disc = b_half * b_half - cc
    pos = disc > 0.0
    sq = jnp.sqrt(jnp.where(pos, disc, 1.0))
    t = -b_half - jnp.where(pos, sq, 0.0)
    alpha = _sigmoid(disc / (tau * 2.0 * jnp.maximum(r, 1e-6)))
    alpha = alpha * _sigmoid(t / jnp.maximum(tau, 1e-6))
    point = o + d * t
    n = (point - c).normalized(eps=1e-12)
    return alpha, t, point, n


def _sphere_param_chunks(spheres, unroll: int):
    """Stack per-sphere scalars into [K, unroll] chunks (padded never-hit)."""
    n = len(spheres)
    k = -(-n // unroll)
    pad = k * unroll - n

    def prep(x, fill):
        if pad:
            x = jnp.concatenate([x, jnp.full((pad,), fill, x.dtype)])
        return x.reshape(k, unroll)

    c = spheres.center
    mat = spheres.material
    return {
        "cx": prep(c[:, 0], 1e8), "cy": prep(c[:, 1], 1e8),
        "cz": prep(c[:, 2], 1e8), "r": prep(spheres.radius, 1e-3),
        "colr": prep(mat.color[:, 0], 0.0), "colg": prep(mat.color[:, 1], 0.0),
        "colb": prep(mat.color[:, 2], 0.0), "amb": prep(mat.ambient, 0.0),
        "kd": prep(mat.diffuse, 0.0), "ks": prep(mat.specular, 0.0),
        "exp": prep(mat.specular_exponent, 1.0),
        "met": prep(mat.metallic, 0.0),
    }


# Above this many spheres the python-unrolled prim loop is chunk-scanned
# (``lax.scan`` with _SOFT_UNROLL spheres unrolled per step) to bound
# compile time; 64+-sphere fit configs otherwise produce HLOs the remote
# compiler chews on for tens of minutes.
_SOFT_UNROLL = 8
_SOFT_UNROLL_MAX = 16


def _box_alpha_t_scalar(p: dict, o: V3, d: V3, tau: float):
    """`_box_alpha_t` from one box's corner scalars (the Pallas-kernel form).

    ``p`` keys: mnx mny mnz mxx mxy mxz. The normal is the entry face's
    (`ops.trace.box_winner_normal` specialized to a single box)."""
    from raytracer_tpu.ops.trace import _safe_inv

    inv = _safe_inv(d)
    t1x, t2x = (p["mnx"] - o.x) * inv.x, (p["mxx"] - o.x) * inv.x
    t1y, t2y = (p["mny"] - o.y) * inv.y, (p["mxy"] - o.y) * inv.y
    t1z, t2z = (p["mnz"] - o.z) * inv.z, (p["mxz"] - o.z) * inv.z
    tn = jnp.maximum(
        jnp.maximum(jnp.minimum(t1x, t2x), jnp.minimum(t1y, t2y)),
        jnp.minimum(t1z, t2z),
    )
    tf = jnp.minimum(
        jnp.minimum(jnp.maximum(t1x, t2x), jnp.maximum(t1y, t2y)),
        jnp.maximum(t1z, t2z),
    )
    alpha = _sigmoid((tf - tn) / jnp.maximum(tau, 1e-6))
    alpha = alpha * _sigmoid(tn / jnp.maximum(tau, 1e-6))
    point = o + d * tn
    # Entry-face normal (box_winner_normal for this single box).
    tx = (jnp.where(d.x >= 0, p["mnx"], p["mxx"]) - o.x) * inv.x
    ty = (jnp.where(d.y >= 0, p["mny"], p["mxy"]) - o.y) * inv.y
    tz = (jnp.where(d.z >= 0, p["mnz"], p["mxz"]) - o.z) * inv.z
    is_x = (tx >= ty) & (tx >= tz)
    is_y = jnp.logical_not(is_x) & (ty >= tz)
    is_z = jnp.logical_not(is_x) & jnp.logical_not(is_y)
    n = V3(
        jnp.where(is_x, -jnp.sign(d.x), 0.0),
        jnp.where(is_y, -jnp.sign(d.y), 0.0),
        jnp.where(is_z, -jnp.sign(d.z), 0.0),
    )
    return alpha, tn, point, n


def _box_alpha_t(scene: Scene, i: int, o: V3, d: V3, tau: float):
    """(coverage, hit distance, hit point, normal) for axis-aligned box ``i``.

    Coverage is a sigmoid in the slab overlap ``t_far - t_near`` (the hard
    test's decision quantity), times a front-ness cut.
    """
    mn, mx = scene.boxes.minimum[i], scene.boxes.maximum[i]
    return _box_alpha_t_scalar(
        {"mnx": mn[0], "mny": mn[1], "mnz": mn[2],
         "mxx": mx[0], "mxy": mx[1], "mxz": mx[2]},
        o, d, tau,
    )


def trace_soft(
    scene: Scene,
    o: V3,
    d: V3,
    *,
    tau: float = 0.02,
    tau_z: float = 0.05,
    depth: int = 0,
) -> V3:
    """Softly-composited radiance per ray.

    ``depth`` reflection bounces (reference: recursive_ray_tracing,
    main.cpp:89-119): each level aggregates an expected surface from the
    softmax weights and recurses along ONE mirrored ray per pixel (see the
    module docstring). ``depth=0`` is primary visibility only.
    """
    shape = jnp.broadcast_shapes(o.x.shape, d.x.shape)
    if len(shape) == 2:
        # TPU fast path: per-level Pallas megakernels with an in-kernel-vjp
        # backward (ops/pallas_soft.py) — same math (the per-primitive
        # helpers below ARE its helpers), tile-resident instead of
        # HBM-streamed. Measured (v5e, 1080p/64 spheres/depth 1): forward
        # 127 -> ~14 ms, fit step 415 -> ~80 ms. Gradients agree except for
        # the inherent subgradient flip of max(t - t_ref, 0) at the anchor
        # primitive's kink (t == t_ref by construction), where f32
        # evaluation order picks the side.
        from raytracer_tpu.ops.pallas_soft import (
            soft_pallas_supported,
            soft_trace_pallas,
        )
        from raytracer_tpu.ops.trace import _inside_shard_map

        if soft_pallas_supported(scene) and not _inside_shard_map(d.x):
            return soft_trace_pallas(
                scene, o, d, jnp.float32(tau), jnp.float32(tau_z), depth
            )
    o = V3(*[jnp.broadcast_to(c, shape) for c in o])
    view = -d
    lights = scene.lights
    walls = scene.walls
    spheres = scene.spheres
    n_s = len(spheres)
    tab = _wall_tables(walls) if len(walls) else None
    scan_spheres = n_s > _SOFT_UNROLL_MAX
    sg = jax.lax.stop_gradient
    # depth > 0 additionally aggregates the expected surface (hit point,
    # normal, metallic and the metallic-weighted color) under the same
    # softmax weights; depth == 0 keeps the lean color-only payload.
    want_surface = depth > 0

    def payload_of(col, point, n, met):
        if not want_surface:
            return {"col": col}
        return {"col": col, "colmet": col * met, "met": met,
                "point": point, "normal": n}

    def fold_ref(t_ref, alpha, t):
        return jnp.minimum(t_ref, jnp.where(alpha > _ALPHA_REF, t, _FAR))

    def fold_in(carry, alpha, t, payload, t_ref):
        # Streaming depth softmax in LINEAR space: the weight of primitive i
        # is w_i = alpha_i * exp(-(t_i - t_ref)+ / tau_z), i.e. exp(logit)
        # with logit = log(alpha) - (t - t_ref)+/tau_z <= 0 — bounded above,
        # so no running-max/logsumexp rescale is needed (e <= 1, s <= n_prims
        # in f32). Far primitives underflow e to 0, which is exactly their
        # softmax weight. Saves log+2*exp per primitive AND the full
        # accumulator-tree rescale multiply (~11 [H,W] arrays per fold).
        s, acc, log_transmit = carry
        e = alpha * jnp.exp(-jnp.maximum(t - t_ref, 0.0) / tau_z)
        return (
            s + e,
            jax.tree_util.tree_map(lambda a, p: a + p * e, acc, payload),
            log_transmit + jnp.log1p(-jnp.minimum(alpha, 1.0 - 1e-7)),
        )

    o_sg = jax.tree_util.tree_map(sg, o)
    d_sg = jax.tree_util.tree_map(sg, d)

    def sphere_shade(params, oo, dd):
        alpha, t, point, n = _sphere_alpha_t_scalar(params, oo, dd, tau)
        col = _shade_point(
            point, n, -dd, V3(params["colr"], params["colg"], params["colb"]),
            params["amb"], params["kd"], params["ks"], params["exp"], lights,
        )
        return alpha, t, payload_of(col, point, n, params["met"])

    # Pass 1 (stop-grad): hard front depth t_ref per ray — the softmax anchor.
    t_ref = (o.x + d.x) * 0.0 + _FAR  # vma-stable carry init under shard_map
    t_ref = sg(t_ref)
    if scan_spheres:
        chunks = jax.tree_util.tree_map(sg, _sphere_param_chunks(spheres, _SOFT_UNROLL))

        def ref_body(t_ref, chunk):
            for u in range(_SOFT_UNROLL):
                p = {key: val[u] for key, val in chunk.items()}
                alpha, t, _, _ = _sphere_alpha_t_scalar(p, o_sg, d_sg, tau)
                t_ref = fold_ref(t_ref, alpha, t)
            return t_ref, None

        t_ref, _ = jax.lax.scan(ref_body, t_ref, chunks)
    else:
        for i in range(n_s):
            alpha, t, _, _ = _sphere_alpha_t(
                jax.tree_util.tree_map(sg, scene), i, o_sg, d_sg, tau
            )
            t_ref = fold_ref(t_ref, alpha, t)
    for i in range(len(walls)):
        alpha, t, _, _ = _wall_alpha_t(
            jax.tree_util.tree_map(sg, tab), i, o_sg, d_sg, tau
        )
        t_ref = fold_ref(t_ref, alpha, t)
    for i in range(len(scene.boxes)):
        alpha, t, _, _ = _box_alpha_t(
            jax.tree_util.tree_map(sg, scene), i, o_sg, d_sg, tau
        )
        t_ref = fold_ref(t_ref, alpha, t)
    t_ref = sg(t_ref)

    # Pass 2: streaming depth-softmax of shaded colors + union coverage.
    sky = background_soa(d, scene.sky)
    if n_s + len(walls) + len(scene.boxes) == 0:
        return sky

    zero = (o.x + d.x) * 0.0
    zero_payload = payload_of(
        V3(zero, zero, zero), V3(zero, zero, zero), V3(zero, zero, zero), zero
    )
    carry = (
        zero,  # running weight sum
        zero_payload,  # running weighted payload
        zero,  # sum log(1 - alpha)
    )
    if scan_spheres:
        chunks = _sphere_param_chunks(spheres, _SOFT_UNROLL)

        def body(carry, chunk):
            for u in range(_SOFT_UNROLL):
                p = {key: val[u] for key, val in chunk.items()}
                alpha, t, payload = sphere_shade(p, o, d)
                carry = fold_in(carry, alpha, t, payload, t_ref)
            return carry, None

        # Rematerialize: without checkpoint the scan's backward saves every
        # per-sphere intermediate (alpha/t/point/color per unrolled sphere
        # per step) — ~70 GB of HBM temps for a 64-sphere 1080p fit step,
        # a guaranteed OOM on one chip. Recomputing the chunk body in the
        # backward keeps only the per-step carries.
        carry, _ = jax.lax.scan(jax.checkpoint(body), carry, chunks)
    else:
        for i in range(n_s):
            alpha, t, point, n = _sphere_alpha_t(scene, i, o, d, tau)
            mat = spheres.material
            col = _shade_point(
                point, n, view, V3.from_stacked(mat.color[i]), mat.ambient[i],
                mat.diffuse[i], mat.specular[i], mat.specular_exponent[i],
                lights,
            )
            payload = payload_of(col, point, n, mat.metallic[i])
            carry = fold_in(carry, alpha, t, payload, t_ref)
    for i in range(len(walls)):
        alpha, t, point, n = _wall_alpha_t(tab, i, o, d, tau)
        mat = walls.material
        col = _shade_point(
            point, n, view, V3.from_stacked(mat.color[i]), mat.ambient[i],
            mat.diffuse[i], mat.specular[i], mat.specular_exponent[i], lights,
        )
        carry = fold_in(carry, alpha, t, payload_of(col, point, n, mat.metallic[i]),
                        t_ref)
    for i in range(len(scene.boxes)):
        alpha, t, point, n = _box_alpha_t(scene, i, o, d, tau)
        mat = scene.boxes.material
        col = _shade_point(
            point, n, view, V3.from_stacked(mat.color[i]), mat.ambient[i],
            mat.diffuse[i], mat.specular[i], mat.specular_exponent[i], lights,
        )
        carry = fold_in(carry, alpha, t, payload_of(col, point, n, mat.metallic[i]),
                        t_ref)

    s, acc, log_transmit = carry
    coverage = 1.0 - jnp.exp(log_transmit)  # union of all alphas
    # Clamp floor at 1e-12, NOT denormal scale: reverse mode multiplies by
    # d(1/s)/ds = -1/s^2, which overflows f32 (-> inf -> NaN) once s drops
    # below ~1e-19. Pixels that dim have coverage ~ s, so both their value
    # and their gradient are negligible either way.
    inv_s = 1.0 / jnp.maximum(s, 1e-12)
    if want_surface:
        # Expected surface under the same weights; one mirrored ray per
        # pixel (reference: main.cpp:111-117). lerp distributes over the
        # composite: sum_i w_i lerp(local_i, C_refl, m_i)
        #          = sum_i w_i local_i (1 - m_i) + (sum_i w_i m_i) C_refl.
        from raytracer_tpu.ops.trace import _REFLECT_EPS

        m_hat = acc["met"] * inv_s
        p_hat = acc["point"] * inv_s
        n_hat = (acc["normal"] * inv_s).normalized(eps=1e-12)
        # Offset must clear the SOFT thickness of the reflecting surface:
        # the behind-ray cut is a sigmoid of width ~tau, so an offset of
        # _REFLECT_EPS << tau leaves the surface ~50% self-visible (soft
        # shadow acne). Scaling with tau keeps the tau -> 0 limit exact.
        refl_o = p_hat + n_hat * jnp.maximum(_REFLECT_EPS, 6.0 * tau)
        refl_d = d.reflect(n_hat)
        # Rematerialize the deeper level: its full streaming pass is
        # recomputed in the backward instead of storing its intermediates
        # (memory would otherwise grow with depth).
        c_refl = jax.checkpoint(
            lambda sc, oo, dd: trace_soft(
                sc, oo, dd, tau=tau, tau_z=tau_z, depth=depth - 1
            )
        )(scene, refl_o, refl_d)
        fg = (acc["col"] - acc["colmet"]) * inv_s + c_refl * m_hat
    else:
        fg = acc["col"] * inv_s
    return fg * coverage + sky * (1.0 - coverage)


@functools.partial(
    jax.jit, static_argnames=("width", "height", "tonemap", "depth")
)
def render_soft(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    *,
    tau: float = 0.02,
    tau_z: float = 0.05,
    tonemap: bool = True,
    depth: int = 0,
) -> jnp.ndarray:
    """Soft-visibility render to ``[H, W, 3]`` — the fit-loop forward pass.

    ``tau`` is the silhouette softness in world units; ``tau_z`` the
    depth-ordering softness. Small values converge to the hard render.
    ``depth`` reflection bounces (differentiable, see trace_soft).
    """
    o, d = raygen_tile(camera, width, height)
    img = trace_soft(scene, o, d, tau=tau, tau_z=tau_z, depth=depth).stacked()
    return reinhard_tonemap(img) if tonemap else img
