"""Camera frame setup and batched primary-ray generation.

Rebuild of ``Camera::init`` (reference: scene.cpp:80-106) and the per-pixel
ray loop in ``rt_scene`` (reference: main.cpp:124-139). The reference loops
640x640 times building one scalar ray at a time; here the whole ``[H, W]``
ray grid is two broadcasted arrays produced in one fused XLA op.

Deliberate deviations from the reference (quirk policy, SURVEY.md §7):

* real ``pi`` instead of 3.14 (scene.cpp:84) — the oracle uses real pi too;
* ``aspect_ratio`` is honored as a float; the reference's
  ``ASPECT_RATIO = 4/3`` integer division (main.cpp:25) is reproduced by
  *configuring* aspect 1.0 in the demo config, not by breaking the math;
* ray directions are normalized at generation. The reference leaves primary
  directions unnormalized, which makes Sphere hits return Euclidean distance
  but Wall hits parametric t (scene.cpp:30,77) — an inconsistent metric.
  With unit directions the two coincide, so one deviation erases another.

Replicated quirk: the primary ray direction is ``position - pixel_center``
(main.cpp:133) — backwards from the physical convention. The demo scene sits
on the +x side while the camera looks at -x, so this flip is load-bearing for
golden-image parity and is kept.
"""

from __future__ import annotations

import jax.numpy as jnp

from raytracer_tpu.core import math3
from raytracer_tpu.core.types import Camera, CameraFrame

__all__ = ["camera_frame", "generate_rays"]


def camera_frame(cam: Camera, width: int, height: int) -> CameraFrame:
    """Compute ray-generation anchors from camera parameters.

    Functional port of ``Camera::init`` (scene.cpp:80-106): focal length from
    the lookat distance, a vertical-FOV frustum, the (u, v, w) basis, and the
    world-space position of pixel (0, 0)'s center.
    """
    position, lookat, vup = cam.position, cam.lookat, cam.vup
    focal_length = math3.length(position - lookat)
    theta = cam.vfov * (jnp.pi / 180.0)
    h = jnp.tan(theta / 2.0)
    fov_height = 2.0 * h * focal_length
    fov_width = fov_height * (width / height)

    w = math3.normalize(position - lookat)
    u = math3.normalize(math3.cross(vup, w))
    v = math3.cross(w, u)

    fov_x = u * fov_width
    fov_y = v * (-fov_height)
    pixel_delta_x = fov_x / width
    pixel_delta_y = fov_y / height

    fov_top_left = position - w * focal_length - fov_x / 2.0 - fov_y / 2.0
    image_top_left = fov_top_left + (pixel_delta_x + pixel_delta_y) * 0.5

    return CameraFrame(
        origin=position,
        image_top_left=image_top_left,
        pixel_delta_x=pixel_delta_x,
        pixel_delta_y=pixel_delta_y,
    )


def generate_rays(
    frame: CameraFrame,
    width: int,
    height: int,
    *,
    row_offset: int | jnp.ndarray = 0,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Batched primary rays for an ``[height, width]`` pixel tile.

    Returns ``(origins, directions)`` with shape ``[H, W, 3]``; directions are
    unit length. ``row_offset`` shifts the tile vertically so sharded
    renderers can generate only their local rows (the TPU replacement for the
    reference's OpenMP scanline split, README.md:13).

    Mirrors the loop body at main.cpp:129-138:
    ``pixel_center = image_top_left + dx*j + dy*i`` and the (replicated)
    direction flip ``dir = position - pixel_center``.
    """
    jj = jnp.arange(width, dtype=jnp.float32)[None, :, None]  # [1, W, 1]
    ii = (
        jnp.arange(height, dtype=jnp.float32)[:, None, None] + row_offset
    )  # [H, 1, 1]
    pixel_center = (
        frame.image_top_left + frame.pixel_delta_x * jj + frame.pixel_delta_y * ii
    )  # [H, W, 3]
    directions = math3.normalize(frame.origin - pixel_center)
    origins = jnp.broadcast_to(frame.origin, directions.shape)
    return origins, directions
