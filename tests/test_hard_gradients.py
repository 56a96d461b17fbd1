"""Hard-path gradient verification (VERDICT r1 item 2; BASELINE "gradient
allclose vs finite differences").

Three gradient regimes exist in the hard renderer (ops/trace.py):
  * take path (<32 prims) — `_boxed_hit` custom VJP: fused-take forward,
    matmul (`_mm_hit`) backward;
  * builtin path — same forward with the native take transpose
    (`builtin_take_transpose`), used by the prim-sharded renderer;
  * mm path (>=32 prims) — `_mm_hit` in both directions.

Material parameters never move silhouettes, so hard-path material gradients
must match central finite differences tightly in every regime. Geometry
gradients are interior derivatives (correct away from silhouettes); they are
checked at soft-test tolerances with perturbations chosen so the FD stencil
crosses no (or negligibly few) visibility flips. The custom-VJP backward is
additionally required to equal the builtin-transpose backward directly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from raytracer_tpu.models.scenes import grid_sphere_scene, reference_demo_camera
from raytracer_tpu.ops.trace import builtin_take_transpose
from raytracer_tpu.render.integrator import render

W, H = 64, 48
DEPTH = 2  # exercises gradient flow through the reflection recursion


@pytest.fixture(scope="module")
def cam():
    return reference_demo_camera()


def _scene(n):
    return grid_sphere_scene(n, distance=4.0 if n <= 16 else 8.0)


def _fd(loss, x, h=1e-3):
    return float((loss(x + h) - loss(x - h)) / (2 * h))


# --- material gradients: smooth in every regime, tight tolerance ---

@pytest.mark.parametrize("n", [4, 64], ids=["take", "mm"])
@pytest.mark.parametrize("param", ["color", "metallic", "diffuse"])
def test_material_gradients_match_fd(cam, n, param):
    scene = _scene(n)
    target = render(scene, cam, W, H, depth=DEPTH, tonemap=False)

    def loss(x):
        m = scene.spheres.material
        if param == "color":
            m = m.replace(color=m.color.at[0, 1].add(x))
        elif param == "metallic":
            m = m.replace(metallic=jnp.clip(m.metallic + x, 0.0, 1.0))
        else:
            m = m.replace(diffuse=m.diffuse + x)
        s2 = scene.replace(spheres=scene.spheres.replace(material=m))
        img = render(s2, cam, W, H, depth=DEPTH, tonemap=False)
        return jnp.mean((img - target) ** 2)

    delta = 0.07
    g = float(jax.grad(loss)(delta))
    fd = _fd(loss, delta)
    assert np.isfinite(g) and np.isfinite(fd)
    assert abs(g - fd) <= 0.02 * max(abs(fd), 1e-6), (param, n, g, fd)


# --- geometry gradients: interior derivative vs FD on visibility-stable
# pixels. Hard visibility is piecewise smooth: the autodiff gradient is the
# interior derivative, and FD agrees exactly wherever the winner map is
# unchanged across the stencil. Image-value thresholds cannot find the
# flipped pixels (sub-threshold grazing flips bias FD by O(1) independent of
# h — measured 34-44% on the radius axis), so the mask comes from the fold's
# winner-index map itself, computable at depth 0 where there is a single
# fold per pixel. Bounce-level gradient flow is covered by the depth-2
# material FD tests above and the VJP-equality test below; silhouette
# gradients themselves are the soft path's job (tests/test_soft.py). ---

@pytest.mark.parametrize("n", [4, 64], ids=["take", "mm"])
@pytest.mark.parametrize("param,delta", [("center", 0.05), ("radius", 0.02)])
def test_geometry_gradients_match_fd(cam, n, param, delta):
    from raytracer_tpu.ops.trace import fold_closest_jnp, raygen_tile

    scene = _scene(n)
    target = render(scene, cam, W, H, depth=0, tonemap=False)
    h = 1e-3
    o, d = raygen_tile(cam, W, H)

    def perturbed(x):
        s = scene.spheres
        if param == "center":
            s = s.replace(center=s.center.at[0, 0].add(x))
        else:
            s = s.replace(radius=s.radius.at[0].add(x))
        return scene.replace(spheres=s)

    _, i_lo = fold_closest_jnp(perturbed(delta - h), o, d)
    _, i_hi = fold_closest_jnp(perturbed(delta + h), o, d)
    stable = i_lo == i_hi
    assert float(stable.mean()) > 0.9  # the mask must be a small correction
    wsum = jnp.maximum(stable.sum(), 1)

    def loss(x):
        img = render(perturbed(x), cam, W, H, depth=0, tonemap=False)
        err = (img - target) ** 2
        return jnp.sum(jnp.where(stable[..., None], err, 0.0)) / wsum

    g = float(jax.grad(loss)(delta))
    fd = float((loss(delta + h) - loss(delta - h)) / (2 * h))
    assert np.isfinite(g) and np.isfinite(fd)
    assert abs(g - fd) <= 0.02 * max(abs(fd), 1e-6), (param, n, g, fd)


# --- custom-VJP backward == builtin take-transpose backward ---

def test_boxed_hit_backward_equals_builtin_transpose(cam):
    scene = _scene(4)

    def loss(s):
        img = render(s, cam, W, H, depth=DEPTH, tonemap=False)
        return jnp.mean(img * jnp.cos(0.1 * img))  # nontrivial cotangents

    g_custom = jax.grad(loss)(scene)
    with builtin_take_transpose():
        g_builtin = jax.grad(loss)(scene)

    flat_c, _ = jax.tree_util.tree_flatten(g_custom)
    flat_b, _ = jax.tree_util.tree_flatten(g_builtin)
    assert len(flat_c) == len(flat_b)
    for a, b in zip(flat_c, flat_b):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        )


def test_mm_hit_matches_take_hit_forward(cam):
    """The custom VJP differentiates _mm_hit in place of the take forward —
    the two implementations must be value-identical (ops/trace.py:431-445)."""
    scene = _scene(4)
    import raytracer_tpu.ops.trace as tr

    img_take = render(scene, cam, W, H, depth=DEPTH, tonemap=False)
    old = tr._MM_GATHER_MIN_PRIMS
    tr._MM_GATHER_MIN_PRIMS = 1  # force the mm path for the same scene
    try:
        img_mm = render(scene, cam, W, H, depth=DEPTH, tonemap=False)
    finally:
        tr._MM_GATHER_MIN_PRIMS = old
    np.testing.assert_allclose(
        np.asarray(img_take), np.asarray(img_mm), rtol=2e-5, atol=2e-6
    )


def test_winner_recompute_never_selects_placeholder():
    """Grazing-hit contract: when the (stop-grad) fold claims a hit but the
    differentiable winner recompute's own discriminant is negative — FMA
    association differs between the two — the recompute must fall back to
    the fold's t, NOT the 1.0 placeholder. The placeholder put the hit
    point ~t=1, the non-unit normal blew base^exponent up to inf, and every
    1080p fit target rendered on the TPU carried inf pixels.

    Simulated deterministically: claim a hit on a sphere the ray strictly
    misses by 1e-4 (recompute det < 0 on every platform), with best_t at
    the closest approach.
    """
    import jax.numpy as jnp

    from raytracer_tpu.core.types import Lights, Materials, Scene, Sky, Spheres
    from raytracer_tpu.core.v3 import V3
    from raytracer_tpu.ops.trace import _mm_hit, _winner_t, shade_soa

    r = 0.5
    miss = 1e-4  # ray passes this far OUTSIDE the sphere
    scene = Scene.create(
        spheres=Spheres.create(
            center=[[5.0, r + miss, 0.0]],
            radius=[r],
            material=Materials.create(color=[[1.0, 0.2, 0.2]]),
        ),
        lights=Lights.create(
            point_position=[(0.0, 0.0, 0.0)], point_color=[(1.0, 1.0, 1.0)]
        ),
        sky=Sky.create(),
    )
    shape = (1, 1)
    o = V3(*[jnp.zeros(shape) for _ in range(3)])
    d = V3(jnp.ones(shape), jnp.zeros(shape), jnp.zeros(shape))
    best_t = jnp.full(shape, 5.0)  # closest approach
    best_i = jnp.zeros(shape, jnp.int32)

    t = _winner_t(scene, o, d, best_t, best_i)
    np.testing.assert_allclose(np.asarray(t), 5.0)  # fold t, not 1.0

    rec = _mm_hit(scene, o, d, best_t, best_i)
    np.testing.assert_allclose(np.asarray(rec.t), 5.0)
    n_len = float(
        np.sqrt(
            np.asarray(rec.normal.x) ** 2
            + np.asarray(rec.normal.y) ** 2
            + np.asarray(rec.normal.z) ** 2
        )[0, 0]
    )
    assert n_len < 1.5, n_len  # near-unit, not the far-off-point blowup
    col = shade_soa(rec, -d, scene.lights)
    assert np.isfinite(np.asarray(col.stacked())).all()


def test_randomized_scene_backward_parity():
    """Gradient fuzz lane: a randomized 130-sphere scene (multi-chunk,
    irregular chunk occupancy incl. a partial last chunk) — pallas
    megakernel backward vs the jnp path, every sphere leaf. Pins chunk
    -boundary scatter/regather cases the structured grid scenes miss."""
    from raytracer_tpu.models.scenes import (
        random_sphere_scene,
        reference_demo_camera,
    )
    from raytracer_tpu.render.integrator import render

    scene = random_sphere_scene(130, seed=7)
    camera = reference_demo_camera()
    W, H = 64, 40
    weights = jnp.cos(jnp.arange(H * W * 3, dtype=jnp.float32)).reshape(
        H, W, 3
    )

    def loss(s, fold):
        img = render(s, camera, W, H, depth=1, tonemap=True, fold=fold)
        return jnp.sum(img * weights)

    g_pal = jax.grad(lambda s: loss(s, "pallas"))(scene)
    g_jnp = jax.grad(lambda s: loss(s, "jnp"))(scene)
    for (path, lp), lj in zip(
        jax.tree_util.tree_leaves_with_path(g_pal),
        jax.tree_util.tree_leaves(g_jnp),
    ):
        if not lp.size or lp.dtype != jnp.float32:
            continue
        assert bool(jnp.isfinite(lp).all()), path
        scale = max(float(jnp.max(jnp.abs(lj))), 1e-4)
        np.testing.assert_allclose(
            np.asarray(lp), np.asarray(lj), atol=1e-2 * scale,
            err_msg=str(path),
        )
