"""Functional camera movement and rotation.

Rebuild of ``Camera::forward/backward/left/right`` and ``rotate_*``
(reference: scene.cpp:106-165; input bindings main.cpp:253-307). The
reference mutates ``position`` in place and *keeps the frustum anchors
stale* (``init()`` is never re-run, main.cpp:154), so its observed movement
pans the whole frustum without rotating. Our camera is a pure pytree whose
frame is recomputed every render, so translation moves BOTH ``position`` and
``lookat`` — reproducing the observed pan-without-rotate behavior with
fresh anchors.

NOTE a reference quirk not replicated: its movement basis comes from
``Camera::direction``, which ``main`` never initializes (scene.h:94 default
= zero vector), so ``forward_vec() = normalize(0)`` divides by zero
(vec.cpp:22-25) — pressing a movement key NaNs the camera in the snapshot.
Here the basis is the well-defined look vector ``lookat - position``.

Rotation follows scene.cpp:137-165: yaw rotates the look vector's xy
component about z; pitch adjusts its z-angle, clamped to (-pi/2, pi/2) by
*rejecting* over-limit steps exactly as the reference does (it restores the
previous pitch, scene.cpp:155-156); after either rotation ``vup`` is reset
to the recomputed up vector (scene.cpp:144, 164).
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracer_tpu.core import math3
from raytracer_tpu.core.types import Camera

__all__ = [
    "move_forward",
    "move_backward",
    "move_left",
    "move_right",
    "rotate_left_right",
    "rotate_up_down",
    "apply_action",
]

DEFAULT_SPEED = 0.1  # reference: cam.movement_speed = 0.1 (main.cpp:149)


def _speed(cam: Camera, speed):
    """Resolve a step size: explicit arg wins, else the camera's own
    ``movement_speed`` leaf (reference: scene.h:95 stores speed ON the
    camera; main.cpp:149 sets it)."""
    return cam.movement_speed if speed is None else speed


def _look(cam: Camera) -> jnp.ndarray:
    return cam.lookat - cam.position


def _translate(cam: Camera, delta: jnp.ndarray) -> Camera:
    return cam.replace(position=cam.position + delta, lookat=cam.lookat + delta)


def move_forward(cam: Camera, speed: float | None = None) -> Camera:
    """Step along the view direction (scene.cpp:120-122)."""
    return _translate(cam, math3.normalize(_look(cam)) * _speed(cam, speed))


def move_backward(cam: Camera, speed: float | None = None) -> Camera:
    return _translate(cam, -math3.normalize(_look(cam)) * _speed(cam, speed))


def _right_vec(cam: Camera) -> jnp.ndarray:
    """cross(direction, vup), normalized (scene.cpp:111-113)."""
    return math3.normalize(math3.cross(_look(cam), cam.vup))


def move_right(cam: Camera, speed: float | None = None) -> Camera:
    return _translate(cam, _right_vec(cam) * _speed(cam, speed))


def move_left(cam: Camera, speed: float | None = None) -> Camera:
    return _translate(cam, -_right_vec(cam) * _speed(cam, speed))


def _set_look(cam: Camera, new_dir: jnp.ndarray) -> Camera:
    """Point the camera along ``new_dir``; reset vup to the recomputed up
    vector like the reference's ``vup = up_vec()`` (scene.cpp:144, 164)."""
    vup = math3.normalize(math3.cross(math3.cross(new_dir, cam.vup), new_dir))
    return cam.replace(lookat=cam.position + new_dir, vup=vup)


def rotate_left_right(cam: Camera, angle) -> Camera:
    """Yaw about z: rotate the look vector's xy component (scene.cpp:137-145)."""
    d = _look(cam)
    base = jnp.sqrt(d[0] ** 2 + d[1] ** 2)
    cur = jnp.arctan2(d[1], d[0])
    new = cur + angle
    nd = jnp.stack([jnp.cos(new) * base, jnp.sin(new) * base, d[2]])
    return _set_look(cam, nd)


def rotate_up_down(cam: Camera, angle) -> Camera:
    """Pitch, rejecting steps past +-pi/2 (scene.cpp:147-165)."""
    d = _look(cam)
    base = jnp.sqrt(d[0] ** 2 + d[1] ** 2)
    pitch = jnp.arctan2(d[2], base)
    new = pitch + angle
    # Over-limit steps keep the previous pitch (reference semantics).
    new = jnp.where(new > jnp.pi / 2, pitch, new)
    new = jnp.where(new < -jnp.pi / 2, -pitch, new)
    r = math3.length(d)
    xy = math3.normalize(jnp.stack([d[0], d[1], jnp.zeros_like(d[0])]))
    nd = (
        xy * (jnp.cos(new) * r)
        + jnp.array([0.0, 0.0, 1.0], d.dtype) * (jnp.sin(new) * r)
    )
    return _set_look(cam, nd)


_ACTIONS = {
    "forward": move_forward,  # W / Up    (main.cpp:264-271)
    "backward": move_backward,  # S / Down
    "left": move_left,  # A / Left
    "right": move_right,  # D / Right
}


def apply_action(cam: Camera, action: str, speed: float | None = None) -> Camera:
    """Keyboard-style camera control (the WASD loop, main.cpp:253-307)."""
    try:
        return _ACTIONS[action](cam, speed)
    except KeyError:
        raise ValueError(f"unknown camera action {action!r}") from None
