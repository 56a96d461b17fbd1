"""Axis-aligned box primitive: oracle parity, Pallas parity, soft gradients."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.core.types import Boxes, Materials, Scene
from raytracer_tpu.diff import render_soft
from raytracer_tpu.models.scenes import (
    mixed_primitive_scene,
    reference_demo_camera,
)
from raytracer_tpu.oracle import numpy_ref
from raytracer_tpu.render import integrator

W, H = 64, 48


def test_box_hit_semantics():
    """Axis ray into a unit box: t = entry face distance, outward normal."""
    boxes = Boxes.create(
        minimum=[[2.0, -0.5, -0.5]],
        maximum=[[3.0, 0.5, 0.5]],
        material=Materials.create([[1.0, 0.0, 0.0]]),
    )
    scene = Scene.create(boxes=boxes)
    from raytracer_tpu.core.v3 import V3
    from raytracer_tpu.ops.trace import closest_hit_soa

    o = V3(*[jnp.zeros((1, 1)) for _ in range(3)])
    d = V3(jnp.ones((1, 1)), jnp.zeros((1, 1)), jnp.zeros((1, 1)))
    rec = closest_hit_soa(scene, o, d)
    assert bool(rec.hit[0, 0])
    np.testing.assert_allclose(float(rec.t[0, 0]), 2.0, atol=1e-6)
    np.testing.assert_allclose(
        [float(rec.normal.x[0, 0]), float(rec.normal.y[0, 0]),
         float(rec.normal.z[0, 0])],
        [-1.0, 0.0, 0.0],
        atol=1e-6,
    )
    # Ray that misses to the side
    d2 = V3(jnp.ones((1, 1)), jnp.ones((1, 1)) * 0.9, jnp.zeros((1, 1)))
    rec2 = closest_hit_soa(scene, o, V3(*[c / jnp.sqrt(1.81) for c in d2]))
    assert not bool(rec2.hit[0, 0])


def test_mixed_scene_vs_oracle():
    scene = mixed_primitive_scene()
    cam = reference_demo_camera()
    img = np.asarray(integrator.render(scene, cam, W, H, depth=2, tonemap=False))
    want = numpy_ref.render_oracle(scene, cam, W, H, depth=2, tonemap=False)
    assert np.isclose(img, want, atol=1e-3).mean() > 0.99
    assert np.isfinite(img).all()


def test_pallas_fold_with_boxes():
    from raytracer_tpu.ops.pallas_fold import fold_closest_pallas
    from raytracer_tpu.ops.trace import fold_closest_jnp, raygen_tile

    scene = mixed_primitive_scene()
    cam = reference_demo_camera()
    o, d = raygen_tile(cam, W, H)
    bt0, bi0 = fold_closest_jnp(scene, o, d)
    bt1, bi1 = fold_closest_pallas(scene, o, d, interpret=True)
    assert float((np.asarray(bi0) == np.asarray(bi1)).mean()) > 0.999
    hit = np.asarray(bt0) < 1e29
    np.testing.assert_allclose(
        np.asarray(bt1)[hit], np.asarray(bt0)[hit], rtol=1e-4, atol=1e-4
    )


def test_box_hard_gradients_finite():
    scene = mixed_primitive_scene()
    cam = reference_demo_camera()
    target = integrator.render(scene, cam, W, H, depth=1, tonemap=False)

    def loss(dx):
        boxes = scene.boxes.replace(minimum=scene.boxes.minimum + dx)
        img = integrator.render(
            scene.replace(boxes=boxes), cam, W, H, depth=1, tonemap=False
        )
        return jnp.mean((img - target) ** 2)

    g = float(jax.grad(loss)(0.05))
    assert np.isfinite(g)


def test_box_soft_gradients_match_fd():
    scene = mixed_primitive_scene(sun=False)
    cam = reference_demo_camera()
    target = render_soft(scene, cam, W, H, tau=0.02, tonemap=False)

    def loss(dx):
        boxes = scene.boxes.replace(
            minimum=scene.boxes.minimum.at[0, 1].add(dx),
            maximum=scene.boxes.maximum.at[0, 1].add(dx),
        )
        img = render_soft(
            scene.replace(boxes=boxes), cam, W, H, tau=0.02, tonemap=False
        )
        return jnp.mean((img - target) ** 2)

    g = float(jax.grad(loss)(0.04))
    h = 1e-3
    fd = float((loss(0.04 + h) - loss(0.04 - h)) / (2 * h))
    assert np.isfinite(g) and np.isfinite(fd)
    assert abs(g - fd) <= 0.08 * max(abs(fd), 1e-7), (g, fd)
