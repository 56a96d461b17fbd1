"""Camera movement/rotation semantics (reference: scene.cpp:106-165)."""

import jax.numpy as jnp
import numpy as np

from raytracer_tpu.core.types import Camera
from raytracer_tpu.ops import camera_ops


def _cam():
    # the reference pose (main.cpp:146-153)
    return Camera.create(
        position=(0.0, 0.0, 0.0), lookat=(-1.0, 0.0, 0.0),
        vup=(0.0, 0.0, -1.0), vfov=90.0,
    )


def test_forward_steps_along_view():
    c2 = camera_ops.move_forward(_cam(), 0.1)
    np.testing.assert_allclose(np.asarray(c2.position), [-0.1, 0, 0], atol=1e-6)
    # lookat translates too: view direction unchanged (pan, not rotate)
    np.testing.assert_allclose(
        np.asarray(c2.lookat - c2.position), [-1, 0, 0], atol=1e-6
    )


def test_left_right_are_inverse():
    c = _cam()
    c2 = camera_ops.move_left(camera_ops.move_right(c, 0.3), 0.3)
    np.testing.assert_allclose(np.asarray(c2.position), np.asarray(c.position), atol=1e-6)


def test_yaw_quarter_turn():
    c = camera_ops.rotate_left_right(_cam(), jnp.pi / 2)
    look = np.asarray(c.lookat - c.position)
    # -x look vector yawed by +90deg about z -> -y
    np.testing.assert_allclose(look, [0, -1, 0], atol=1e-6)


def test_pitch_clamps_past_vertical():
    c = _cam()
    c1 = camera_ops.rotate_up_down(c, 0.5)
    look1 = np.asarray(c1.lookat - c1.position)
    assert look1[2] > 0  # pitched up
    # A step that would exceed +pi/2 keeps the previous pitch (scene.cpp:155)
    c2 = camera_ops.rotate_up_down(c1, 2.0)
    look2 = np.asarray(c2.lookat - c2.position)
    np.testing.assert_allclose(look2, look1, atol=1e-5)


def test_movement_speed_is_camera_datum():
    """Speed lives ON the camera (scene.h:95, main.cpp:149), not a module
    constant: a camera built with movement_speed=0.25 steps 0.25 when no
    explicit speed is passed, and an explicit argument still wins."""
    c = Camera.create(
        position=(0.0, 0.0, 0.0), lookat=(-1.0, 0.0, 0.0),
        vup=(0.0, 0.0, -1.0), vfov=90.0, movement_speed=0.25,
    )
    c2 = camera_ops.apply_action(c, "forward")
    np.testing.assert_allclose(np.asarray(c2.position), [-0.25, 0, 0], atol=1e-6)
    c3 = camera_ops.move_forward(c, 0.1)  # explicit arg overrides
    np.testing.assert_allclose(np.asarray(c3.position), [-0.1, 0, 0], atol=1e-6)
    # default matches the reference's cam.movement_speed = 0.1
    np.testing.assert_allclose(float(_cam().movement_speed), 0.1, rtol=1e-6)


def test_actions_keep_render_finite():
    from raytracer_tpu.models.scenes import reference_demo_scene
    from raytracer_tpu.render.integrator import render

    cam = _cam()
    for a in ("forward", "backward", "left", "right"):
        cam = camera_ops.apply_action(cam, a)
    img = render(reference_demo_scene(), cam, 32, 24, depth=1)
    assert bool(jnp.isfinite(img).all())
