"""Pallas closest-hit megakernel vs the jnp fold (interpret mode on CPU;
the real-TPU path is exercised by bench.py and the verify drive)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.models.scenes import (
    grid_sphere_scene,
    reference_demo_camera,
    reference_demo_scene,
)
from raytracer_tpu.ops.pallas_fold import fold_closest_pallas
from raytracer_tpu.ops.trace import fold_closest_jnp, raygen_tile


@pytest.mark.parametrize(
    "scene_fn",
    [
        reference_demo_scene,
        lambda: grid_sphere_scene(5, distance=4.0),  # non-multiple of unroll
        lambda: grid_sphere_scene(24, distance=6.0),
    ],
)
def test_pallas_fold_matches_jnp(scene_fn):
    scene = scene_fn()
    cam = reference_demo_camera()
    o, d = raygen_tile(cam, 96, 60)
    bt0, bi0 = fold_closest_jnp(scene, o, d)
    bt1, bi1 = fold_closest_pallas(scene, o, d, interpret=True)
    assert float((np.asarray(bi0) == np.asarray(bi1)).mean()) > 0.999
    hit = np.asarray(bt0) < 1e29
    np.testing.assert_allclose(
        np.asarray(bt1)[hit], np.asarray(bt0)[hit], rtol=1e-4, atol=1e-4
    )


def test_pallas_fold_walls_only():
    from raytracer_tpu.core.types import Materials, Scene, Walls

    walls = Walls.create(
        position=[[3.0, 2.0, 0.0], [3.0, -3.0, 0.0]],
        normal=[[0.0, -1.0, 0.0], [0.0, 1.0, 0.0]],
        length=[1.0, 2.0],
        width=[1.0, 2.0],
        material=Materials.create([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]]),
    )
    scene = Scene.create(walls=walls)
    cam = reference_demo_camera()
    o, d = raygen_tile(cam, 64, 48)
    bt0, bi0 = fold_closest_jnp(scene, o, d)
    bt1, bi1 = fold_closest_pallas(scene, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(bi0), np.asarray(bi1))


@pytest.mark.parametrize(
    "scene_fn",
    [
        reference_demo_scene,
        lambda: grid_sphere_scene(5, distance=4.0),
        lambda: grid_sphere_scene(24, distance=6.0),
    ],
)
def test_pallas_shortlist_fold_matches_jnp(scene_fn):
    """The shortlist kernel is bit-compatible (culling is conservative)."""
    from raytracer_tpu.ops.pallas_fold import fold_closest_pallas_shortlist

    scene = scene_fn()
    cam = reference_demo_camera()
    o, d = raygen_tile(cam, 96, 60)
    bt0, bi0 = fold_closest_jnp(scene, o, d)
    bt1, bi1 = fold_closest_pallas_shortlist(scene, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(bi0), np.asarray(bi1))
    hit = np.asarray(bt0) < 1e29
    np.testing.assert_allclose(
        np.asarray(bt1)[hit], np.asarray(bt0)[hit], rtol=1e-4, atol=1e-4
    )


def test_pallas_shortlist_incoherent_rays_and_mask():
    """Divergent (bounce-like) rays with an active mask: active lanes exact,
    inactive lanes miss cleanly."""
    from raytracer_tpu.core.v3 import V3
    from raytracer_tpu.ops.pallas_fold import fold_closest_pallas_shortlist

    scene = grid_sphere_scene(64, distance=5.0)
    rng = np.random.default_rng(11)
    shape = (60, 96)
    o = V3(*[jnp.asarray(rng.uniform(-1, 6, shape), jnp.float32) for _ in range(3)])
    dd = rng.standard_normal((3,) + shape).astype(np.float32)
    dd /= np.linalg.norm(dd, axis=0, keepdims=True)
    d = V3(*[jnp.asarray(c) for c in dd])
    mask = jnp.asarray(rng.uniform(size=shape) < 0.6)

    bt0, bi0 = fold_closest_jnp(scene, o, d)
    bt1, bi1 = fold_closest_pallas_shortlist(
        scene, o, d, active=mask, interpret=True
    )
    m = np.asarray(mask)
    np.testing.assert_array_equal(np.asarray(bi0)[m], np.asarray(bi1)[m])
    hit = (np.asarray(bt0) < 1e29) & m
    np.testing.assert_allclose(
        np.asarray(bt1)[hit], np.asarray(bt0)[hit], rtol=1e-4, atol=1e-4
    )
    # Inactive lanes: arbitrary but clean (miss sentinel or a real record).
    assert np.isfinite(np.asarray(bt1)).all()


def test_pallas_shortlist_walls_only_and_all_dead():
    from raytracer_tpu.core.types import Materials, Scene, Walls
    from raytracer_tpu.core.v3 import V3
    from raytracer_tpu.ops.pallas_fold import fold_closest_pallas_shortlist

    walls = Walls.create(
        position=[[3.0, 2.0, 0.0]],
        normal=[[0.0, -1.0, 0.0]],
        length=[4.0],
        width=[4.0],
        material=Materials.create([[1.0, 0.0, 0.0]]),
    )
    scene = Scene.create(walls=walls)
    cam = reference_demo_camera()
    o, d = raygen_tile(cam, 64, 48)
    bt0, bi0 = fold_closest_jnp(scene, o, d)
    bt1, bi1 = fold_closest_pallas_shortlist(scene, o, d, interpret=True)
    np.testing.assert_array_equal(np.asarray(bi0), np.asarray(bi1))

    # Fully dead mask: every lane returns the miss sentinel.
    dead = jnp.zeros(bt0.shape, bool)
    bt2, bi2 = fold_closest_pallas_shortlist(
        scene, o, d, active=dead, interpret=True
    )
    assert (np.asarray(bi2) == -1).all()


def test_render_shortlist_fold_matches_jnp_render():
    """Integrator-level equivalence: fold='pallas' == fold='jnp' with the
    bounce-loop active masking in play."""
    from raytracer_tpu.render.integrator import render

    scene = grid_sphere_scene(40, distance=6.0)
    cam = reference_demo_camera()
    img0 = render(scene, cam, 96, 60, depth=2, fold="jnp")
    img1 = render(scene, cam, 96, 60, depth=2, fold="pallas")
    # 5e-4: fold='pallas' is the whole-trace megakernel — same formulas as
    # the XLA pipeline but its own FMA fusion, which grazing hits amplify
    # (sqrt near disc=0); worst observed 2.9e-4 on one pixel in 17k.
    np.testing.assert_allclose(
        np.asarray(img1), np.asarray(img0), rtol=5e-4, atol=5e-4
    )


# ---------------------------------------------------------------------------
# Hit-record kernel: fold + in-kernel winner regather (VERDICT r1 item 1 —
# removes the mm attribute gather from the large-scene forward pass).
# ---------------------------------------------------------------------------


def test_hit_kernel_matches_mm_hit():
    """Kernel hit record == _mm_hit at the same selection, on hit lanes.

    Materials must be exact (pure selects of the same table values);
    t/point/normal are the same formulas modulo FMA fusion, so grazing
    hits may differ at ~1e-3.
    """
    import jax.numpy as jnp

    from raytracer_tpu.core.v3 import V3
    from raytracer_tpu.models.scenes import mixed_primitive_scene, grid_sphere_scene
    from raytracer_tpu.ops.pallas_fold import fold_closest_pallas_shortlist
    from raytracer_tpu.ops.trace import _kernel_hit_record, _mm_hit, raygen_tile
    from raytracer_tpu.models.scenes import reference_demo_camera

    cam = reference_demo_camera()
    for scene in (grid_sphere_scene(64), mixed_primitive_scene()):
        o, d = raygen_tile(cam, 128, 64)
        bt, bi = fold_closest_pallas_shortlist(scene, o, d, interpret=True)
        o_b = V3(*[jnp.broadcast_to(c, d.x.shape) for c in o])
        ref = _mm_hit(scene, o_b, d, bt, bi)
        rec = _kernel_hit_record(scene, o, d, None)
        hit = np.asarray(ref.hit)
        assert np.array_equal(hit, np.asarray(rec.hit))
        assert np.array_equal(np.asarray(ref.prim_index), np.asarray(rec.prim_index))
        exact = ["color", "ambient", "metallic", "diffuse", "specular",
                 "specular_exponent"]
        for name in exact:
            a = jax.tree_util.tree_leaves(getattr(ref, name))
            b = jax.tree_util.tree_leaves(getattr(rec, name))
            for x, y in zip(a, b):
                np.testing.assert_array_equal(
                    np.asarray(x)[hit], np.asarray(y)[hit], err_msg=name
                )
        for name in ["t", "point", "normal"]:
            a = jax.tree_util.tree_leaves(getattr(ref, name))
            b = jax.tree_util.tree_leaves(getattr(rec, name))
            for x, y in zip(a, b):
                np.testing.assert_allclose(
                    np.asarray(x)[hit], np.asarray(y)[hit], atol=2e-3,
                    err_msg=name,
                )


def test_hit_kernel_render_and_grads_match_jnp_path():
    """Full render through the kernel-hit path == jnp path; gradients flow
    through the custom-VJP _mm_hit backward and match the jnp path."""
    import jax.numpy as jnp

    from raytracer_tpu.models.scenes import grid_sphere_scene, reference_demo_camera
    from raytracer_tpu.render.integrator import render

    cam = reference_demo_camera()
    scene = grid_sphere_scene(64)
    W, H = 128, 64
    ref = np.asarray(render(scene, cam, W, H, depth=2, tonemap=False, fold="jnp"))
    new = np.asarray(render(scene, cam, W, H, depth=2, tonemap=False, fold="pallas"))
    np.testing.assert_allclose(new, ref, atol=1e-4)

    def loss(c, fold):
        s2 = scene.replace(spheres=scene.spheres.replace(center=c))
        img = render(s2, cam, W, H, depth=2, tonemap=False, fold=fold)
        return jnp.mean(img ** 2)

    g_jnp = np.asarray(jax.grad(lambda c: loss(c, "jnp"))(scene.spheres.center))
    g_pal = np.asarray(jax.grad(lambda c: loss(c, "pallas"))(scene.spheres.center))
    assert np.isfinite(g_pal).all()
    np.testing.assert_allclose(g_pal, g_jnp, atol=1e-2 * np.abs(g_jnp).max())


def test_backward_megakernel_full_scene_grads_match_jnp_path():
    """The backward trace megakernel (trace_levels_pallas_bwd): gradients
    w.r.t. EVERY scene leaf — geometry, materials, lights, sky — and the
    rays match the fused-jnp path. Exercises the in-kernel jax.vjp of
    _level_math, the one-hot-matmul parameter scatter, the light/sky
    scalar cotangent packing, and the level-to-level ray cotangent chain
    (depth 2 = three chained backward kernels)."""
    import jax.numpy as jnp

    from raytracer_tpu.models.scenes import (
        mixed_primitive_scene,
        reference_demo_camera,
    )
    from raytracer_tpu.render.integrator import render

    cam = reference_demo_camera()
    scene = mixed_primitive_scene()
    W, H = 40, 24
    weights = jnp.cos(jnp.arange(H * W * 3, dtype=jnp.float32)).reshape(
        H, W, 3
    )

    def loss(s, fold):
        img = render(s, cam, W, H, depth=2, tonemap=True, fold=fold)
        return jnp.sum(img * weights)

    g_pal = jax.grad(lambda s: loss(s, "pallas"))(scene)
    g_jnp = jax.grad(lambda s: loss(s, "jnp"))(scene)
    paths_p = jax.tree_util.tree_leaves_with_path(g_pal)
    leaves_j = jax.tree_util.tree_leaves(g_jnp)
    assert len(paths_p) == len(leaves_j)
    for (path, lp), lj in zip(paths_p, leaves_j):
        if not lp.size or lp.dtype != jnp.float32:
            continue
        assert bool(jnp.isfinite(lp).all()), path
        scale = max(float(jnp.max(jnp.abs(lj))), 1e-4)
        np.testing.assert_allclose(
            np.asarray(lp), np.asarray(lj), atol=2e-3 * scale,
            err_msg=str(path),
        )


def test_all_miss_gradients_finite():
    """Pin the load-bearing stop-gradient invariant (ADVICE r4): the fold
    kernels drop the `disc >= 0` guard in favor of NaN-compare rejection
    (pallas_fold sphere_one), which is safe ONLY because closest_hit_soa /
    _pallas_trace always call them on stop-gradiented inputs. If a future
    path ever differentiates THROUGH a fold, every miss lane's
    sqrt(negative disc) NaNs — this renders a scene whose sphere no ray
    can hit (all-miss lanes everywhere) and asserts the scene gradient is
    finite."""
    import jax.numpy as jnp

    from raytracer_tpu.models.scenes import (
        reference_demo_camera,
        reference_demo_scene,
    )
    from raytracer_tpu.render.integrator import render

    base = reference_demo_scene()
    # Move every primitive far behind the camera: every lane misses.
    far = base.replace(
        spheres=base.spheres.replace(
            center=base.spheres.center + jnp.float32(1e4)
        )
    )

    def loss(c):
        sc = far.replace(spheres=far.spheres.replace(center=c))
        img = render(sc, cam, 64, 48, depth=2, tonemap=False, fold="pallas")
        return jnp.mean(img ** 2)

    cam = reference_demo_camera()
    g = jax.grad(loss)(far.spheres.center)
    assert bool(jnp.isfinite(g).all())


def test_fused_backward_matches_per_level(monkeypatch):
    """RT_FUSED_BWD (the whole-sweep backward kernel) produces the same
    gradients as the per-level backward chain on a fused-class scene, for
    every scene leaf and the mixed primitive families. jax.clear_caches()
    between configs: the flag is read at trace time (CLAUDE.md cache
    trap)."""
    import jax.numpy as jnp

    from raytracer_tpu.models.scenes import (
        mixed_primitive_scene,
        reference_demo_camera,
    )
    from raytracer_tpu.ops import pallas_fold as pf
    from raytracer_tpu.render.integrator import render

    cam = reference_demo_camera()
    scene = mixed_primitive_scene()
    W, H = 40, 24
    weights = jnp.cos(jnp.arange(H * W * 3, dtype=jnp.float32)).reshape(
        H, W, 3
    )

    def loss(s):
        img = render(s, cam, W, H, depth=2, tonemap=True, fold="pallas")
        return jnp.sum(img * weights)

    grads = {}
    for fused in (True, False):
        monkeypatch.setattr(pf, "_FUSED_BWD", fused)
        jax.clear_caches()
        grads[fused] = jax.grad(loss)(scene)
    fl = jax.tree_util.tree_leaves_with_path(grads[True])
    pl_ = jax.tree_util.tree_leaves(grads[False])
    assert len(fl) == len(pl_)
    for (path, a), b in zip(fl, pl_):
        if not a.size or a.dtype != jnp.float32:
            continue
        assert bool(jnp.isfinite(a).all()), path
        scale = max(float(jnp.max(jnp.abs(b))), 1e-6)
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-5 * scale,
            err_msg=str(path),
        )


def test_ray_stats_kernel_matches_xla_stats():
    """The level-0 reach-stats kernel (_ray_stats, TPU-only in production)
    computes the same per-tile phase-A statistics as the pure-XLA
    formulation — run here with interpret=True on randomized rays/masks
    (ADVICE r2: drift in the kernel's reach AABB would silently cull
    visible chunks on the real TPU only)."""
    import jax.numpy as jnp

    from raytracer_tpu.ops import pallas_fold as pf

    rng = np.random.default_rng(7)
    sl_r, cols = 64, 128
    h, w = sl_r * 2, cols
    rays = tuple(
        jnp.asarray(rng.normal(size=(h, w)).astype(np.float32) * s)
        for s in (2.0, 2.0, 2.0, 1.0, 1.0, 1.0)
    )
    act = jnp.asarray(rng.random((h, w)) > 0.3)
    slab = jnp.asarray(
        np.array([-3, -3, -3, 3, 3, 3, 0, 0], np.float32)
    )

    s_all = pf._ray_stats(
        slab, rays, act.astype(jnp.float32), sl_r=sl_r, interpret=True,
        cfg=pf._cfg_key(),
    )
    got = pf._stats_to_phase_a(s_all)

    # The pure-XLA twin (the `not interpret` branch of _shortlist_phase_a).
    ox, oy, oz, dx, dy, dz = rays
    lo, hi = slab[:3], slab[3:6]
    th, tw = h // sl_r, w // pf._SL_C

    def axis_interval(o_c, d_c, lo_c, hi_c):
        ok = jnp.abs(d_c) > 1e-12
        inv = jnp.where(ok, 1.0 / jnp.where(ok, d_c, 1.0),
                        jnp.where(d_c >= 0.0, 1e30, -1e30))
        t1, t2 = (lo_c - o_c) * inv, (hi_c - o_c) * inv
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    ex_lo, ex_hi = axis_interval(ox, dx, lo[0], hi[0])
    ey_lo, ey_hi = axis_interval(oy, dy, lo[1], hi[1])
    ez_lo, ez_hi = axis_interval(oz, dz, lo[2], hi[2])
    t0 = jnp.maximum(jnp.maximum(jnp.maximum(ex_lo, ey_lo), ez_lo), 0.0)
    t_ex = jnp.minimum(jnp.minimum(ex_hi, ey_hi), ez_hi)
    used = act & (t_ex >= t0) & (t_ex > 0.0)
    BIG = jnp.float32(1e30)

    def seg_minmax(o_c, d_c):
        p1, p2 = o_c + t0 * d_c, o_c + t_ex * d_c
        p_lo = jnp.where(used, jnp.minimum(p1, p2), BIG)
        p_hi = jnp.where(used, jnp.maximum(p1, p2), -BIG)
        return (
            pf._slice_reduce(p_lo, th, tw, jnp.min, sl_r) - pf._AABB_PAD,
            pf._slice_reduce(p_hi, th, tw, jnp.max, sl_r) + pf._AABB_PAD,
        )

    want = []
    for o_c, d_c in ((ox, dx), (oy, dy), (oz, dz)):
        want.extend(seg_minmax(o_c, d_c))
    cnt = jnp.maximum(
        pf._slice_reduce(used.astype(jnp.float32), th, tw, jnp.sum, sl_r),
        1.0,
    )
    for o_c, d_c in ((ox, dx), (oy, dy), (oz, dz)):
        p0 = jnp.where(used, o_c + t0 * d_c, 0.0)
        want.append(pf._slice_reduce(p0, th, tw, jnp.sum, sl_r) / cnt)
    want.append(pf._slice_reduce(act, th, tw, jnp.any, sl_r))

    assert len(got) == len(want) == 10
    for g, expect in zip(got, want):
        if g.dtype == jnp.bool_:
            np.testing.assert_array_equal(np.asarray(g), np.asarray(expect))
        else:
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(expect), rtol=1e-6, atol=1e-5
            )


def test_ray_stats_chunk_reach_matches_xla():
    """The stats kernel's per-chunk tube-reach union rows (the tube-accepted
    shortlist input) match a pure-jnp evaluation of the same test, and the
    union is CONSERVATIVE: every chunk whose member sphere a ray actually
    hits is marked reachable."""
    import jax.numpy as jnp

    from raytracer_tpu.models import scenes
    from raytracer_tpu.ops import pallas_fold as pf
    from raytracer_tpu.ops.trace import raygen_tile

    scene = scenes.grid_sphere_scene(64)
    cam = scenes.reference_demo_camera()
    sl_r = 32
    h, w = sl_r * 4, 128
    o, d = raygen_tile(cam, w, h)
    ox = jnp.broadcast_to(o.x, (h, w))
    oy = jnp.broadcast_to(o.y, (h, w))
    oz = jnp.broadcast_to(o.z, (h, w))
    rays = (ox, oy, oz, d.x, d.y, d.z)
    rng = np.random.default_rng(3)
    act = jnp.asarray(rng.random((h, w)) > 0.2)

    unroll = pf._resolve_unroll(64)
    n_chunks = -(-64 // unroll)
    c_lo, c_hi, gtables, gr, slab = pf._chunk_culling_tables(scene, n_chunks)
    s_all = pf._ray_stats(
        slab, rays, act.astype(jnp.float32),
        gtables[:5] + gtables[10:16],  # the 11 chunk-level tables
        sl_r=sl_r, n_chunks=n_chunks, interpret=True,
        cfg=(unroll, pf._resolve_gate_geom(64, unroll)),
    )
    got = np.asarray(pf._stats_to_chunk_reach(s_all, n_chunks))

    # jnp twin of the kernel's tube test (slab-clipped segment vs chunk
    # bounding sphere), reduced to per-tile any.
    gx, gy, gz, gg, gr2 = gtables[:5]
    dx, dy, dz = rays[3:]
    lo, hi = slab[:3], slab[3:6]

    def axis_iv(o_c, d_c, lo_c, hi_c):
        inv = pf._srecip(d_c)
        t1, t2 = (lo_c - o_c) * inv, (hi_c - o_c) * inv
        return jnp.minimum(t1, t2), jnp.maximum(t1, t2)

    x1, x2 = axis_iv(ox, dx, lo[0], hi[0])
    y1, y2 = axis_iv(oy, dy, lo[1], hi[1])
    z1, z2 = axis_iv(oz, dz, lo[2], hi[2])
    t0 = jnp.maximum(jnp.maximum(jnp.maximum(x1, y1), z1), 0.0)
    t_ex = jnp.minimum(jnp.minimum(x2, y2), z2)
    used = act & (t_ex >= t0) & (t_ex > 0.0)
    oo = ox * ox + oy * oy + oz * oz
    do = dx * ox + dy * oy + dz * oz
    th, tw = h // sl_r, w // pf._SL_C
    want = np.zeros((th, tw, n_chunks), bool)
    alx, aly, alz, ahx, ahy, ahz = gtables[10:16]
    for c in range(n_chunks):
        if pf._resolve_gate_geom(64, unroll) == "aabb":
            ivx, ivy, ivz = pf._srecip(dx), pf._srecip(dy), pf._srecip(dz)
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
            reach = used & (jnp.maximum(tn, t0) <= jnp.minimum(tf, t_ex))
        else:
            s_g = dx * gx[c] + dy * gy[c] + dz * gz[c]
            m_g = ox * gx[c] + oy * gy[c] + oz * gz[c]
            tc = jnp.clip(s_g - do, t0, t_ex)
            dist2 = oo - 2.0 * m_g + gg[c] + tc * (2.0 * (do - s_g) + tc)
            reach = used & (dist2 <= gr2[c])
        want[..., c] = np.asarray(
            jnp.any(reach.reshape(th, sl_r, tw, pf._SL_C), axis=(1, 3))
        )
    np.testing.assert_array_equal(got, want)

    # Conservativeness vs TRUE hits: fold the full scene per lane and check
    # each winner sphere's chunk is marked reachable for its tile.
    from raytracer_tpu.ops.trace import fold_closest_jnp
    from raytracer_tpu.core.v3 import V3

    best_t, best_i = fold_closest_jnp(scene, V3(ox, oy, oz), d)
    hit_sphere = np.asarray((best_t < pf.MISS_T) & (best_i < 64) & act)
    chunk_of = np.asarray(best_i) // unroll
    ti = np.arange(h)[:, None] // sl_r
    tj = np.arange(w)[None, :] // pf._SL_C
    ys, xs = np.nonzero(hit_sphere)
    assert len(ys)  # scene visible in this crop
    assert got[ti[ys, 0], tj[0, xs], chunk_of[ys, xs]].all()


def test_gate_geometries_bit_compatible(monkeypatch):
    """The "aabb" and "sphere" chunk-gate geometries (RT_GATE_GEOM) give
    bit-identical trace outputs — both gates only skip chunks no live
    segment can touch, so the fold result cannot depend on the geometry."""
    from raytracer_tpu.core.v3 import V3
    from raytracer_tpu.models.scenes import random_sphere_scene
    from raytracer_tpu.ops import pallas_fold as pf
    from raytracer_tpu.ops import raygen

    scene = random_sphere_scene(130, seed=5)  # multi-chunk, irregular
    cam = reference_demo_camera()
    frame = raygen.camera_frame(cam, 160, 96)
    o3, d3 = raygen.generate_rays(frame, 160, 96)
    o = V3(o3[..., 0], o3[..., 1], o3[..., 2])
    d = V3(d3[..., 0], d3[..., 1], d3[..., 2])

    outs = {}
    for geom in ("aabb", "sphere"):
        monkeypatch.setenv("RT_GATE_GEOM", geom)
        acc, ts, idxs = pf.trace_levels_pallas(scene, o, d, depth=2)
        outs[geom] = (acc, ts, idxs)
    a, b = outs["aabb"], outs["sphere"]
    for ca, cb in zip((a[0].x, a[0].y, a[0].z), (b[0].x, b[0].y, b[0].z)):
        np.testing.assert_array_equal(np.asarray(ca), np.asarray(cb))
    for ta, tb in zip(a[1], b[1]):
        np.testing.assert_array_equal(np.asarray(ta), np.asarray(tb))
    for ia, ib in zip(a[2], b[2]):
        np.testing.assert_array_equal(np.asarray(ia), np.asarray(ib))


def test_interleaved_scene_builds():
    """Two scenes with DIFFERENT chunk sizes / gate geometries (3 spheres:
    unroll 3 + sphere gates; 64 spheres: unroll 16 + aabb gates) traced
    interleaved — including concurrently from two threads — produce the
    same results as traced alone. Pins the VERDICT r4 hazard: the fold
    config lives in a ContextVar and the jitted entries key their caches
    on it (`_jit_cfg`), so one build can never observe another's chunk
    size (the old module-global `_UNROLL` could)."""
    import threading

    from raytracer_tpu.ops import pallas_fold as pf

    cam = reference_demo_camera()
    o, d = raygen_tile(cam, 96, 60)
    scene_a = reference_demo_scene()          # unroll 3, sphere gate
    scene_b = grid_sphere_scene(64, distance=6.0)  # unroll 16, aabb gate
    assert pf._resolve_unroll(len(scene_a.spheres)) != pf._resolve_unroll(64)

    def run(scene):
        return pf.fold_closest_pallas_shortlist(scene, o, d, interpret=True)

    ref = {k: tuple(np.asarray(x) for x in run(s))
           for k, s in (("a", scene_a), ("b", scene_b))}
    # Sanity: each matches the jnp fold (a wrong-chunk-size kernel cannot).
    for key, scene in (("a", scene_a), ("b", scene_b)):
        bt0, bi0 = fold_closest_jnp(scene, o, d)
        assert float((np.asarray(bi0) == ref[key][1]).mean()) > 0.999

    # Interleaved, same thread.
    for key, scene in (("a", scene_a), ("b", scene_b), ("a", scene_a)):
        bt, bi = run(scene)
        np.testing.assert_array_equal(np.asarray(bi), ref[key][1])
        np.testing.assert_array_equal(np.asarray(bt), ref[key][0])

    # Concurrent threads, each building its own scene repeatedly.
    errs = []

    def worker(key, scene):
        try:
            for _ in range(2):
                bt, bi = run(scene)
                np.testing.assert_array_equal(np.asarray(bi), ref[key][1])
        except Exception as e:  # pragma: no cover - failure reporting
            errs.append((key, e))

    ts = [threading.Thread(target=worker, args=kv)
          for kv in (("a", scene_a), ("b", scene_b))]
    for t in ts:
        t.start()
    for t in ts:
        t.join()
    assert not errs, errs


def test_row_sorted_traversal_bit_exact(monkeypatch):
    """RT_ROW_SORT=1 (row-permuted bounce traversal) is a pure permutation:
    trace outputs are bit-identical to the unsorted path at every level,
    for 32- and 8-row sorted tiles. (Default-off: measured a LOSS on the
    v5e — see the _ROW_SORT comment block — but the machinery stays
    correct for sparser scene classes.)"""
    from raytracer_tpu.core.v3 import V3
    from raytracer_tpu.ops import pallas_fold as pf
    from raytracer_tpu.ops import raygen

    scene = grid_sphere_scene(130)
    cam = reference_demo_camera()
    frame = raygen.camera_frame(cam, 160, 96)
    o3, d3 = raygen.generate_rays(frame, 160, 96)
    o = V3(o3[..., 0], o3[..., 1], o3[..., 2])
    d = V3(d3[..., 0], d3[..., 1], d3[..., 2])

    acc0, ts0, idx0 = pf.trace_levels_pallas(scene, o, d, depth=3)
    for sort_r in (32, 8):
        monkeypatch.setattr(pf, "_ROW_SORT", True)
        monkeypatch.setattr(pf, "_SORT_R", sort_r)
        acc1, ts1, idx1 = pf.trace_levels_pallas(scene, o, d, depth=3)
        np.testing.assert_array_equal(np.asarray(acc0.x), np.asarray(acc1.x))
        np.testing.assert_array_equal(np.asarray(acc0.y), np.asarray(acc1.y))
        np.testing.assert_array_equal(np.asarray(acc0.z), np.asarray(acc1.z))
        for k, (a, b) in enumerate(zip(ts0, ts1)):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"t level {k}"
            )
        for k, (a, b) in enumerate(zip(idx0, idx1)):
            np.testing.assert_array_equal(
                np.asarray(a), np.asarray(b), err_msg=f"idx level {k}"
            )
