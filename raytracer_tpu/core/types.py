"""Scene, material, light, and camera pytrees.

TPU-native rebuild of the reference's object-oriented scene graph
(reference: scene.h:5-112). Instead of a ``vector<unique_ptr<SceneGeometry>>``
with per-ray virtual dispatch, the scene is a structure-of-arrays pytree:
every primitive attribute is a stacked ``f32[N, ...]`` array, so intersection
tests run batched over (rays x primitives) on the VPU and every leaf is
reachable by ``jax.grad`` — the whole scene is differentiable by construction.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from raytracer_tpu.core import math3

__all__ = [
    "pytree_dataclass",
    "Materials",
    "Spheres",
    "Walls",
    "Boxes",
    "Lights",
    "Sky",
    "Scene",
    "Camera",
    "CameraFrame",
]


def pytree_dataclass(cls=None, *, meta_fields: Sequence[str] = ()):
    """Register a frozen dataclass as a JAX pytree node.

    ``meta_fields`` are static (hashed into the jit cache key); everything
    else is traced array data that transforms like ``jax.grad``/``vmap`` see.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data = [f.name for f in dataclasses.fields(c) if f.name not in meta_fields]
        jax.tree_util.register_dataclass(c, data, list(meta_fields))

        def replace(self, **kwargs):
            return dataclasses.replace(self, **kwargs)

        c.replace = replace
        return c

    return wrap(cls) if cls is not None else wrap


def _f32(x) -> jnp.ndarray:
    return jnp.asarray(x, dtype=jnp.float32)


@pytree_dataclass
class Materials:
    """Per-primitive Blinn-Phong material parameters, stacked.

    Mirrors the reference ``Material`` struct (scene.h:35-49): ``color`` is the
    albedo, ``ambient`` the unlit base intensity, ``metallic`` the reflection
    mix weight, ``diffuse``/``specular`` the lobe strengths, and
    ``specular_exponent`` the highlight sharpness.
    """

    color: jnp.ndarray  # f32[N, 3]
    ambient: jnp.ndarray  # f32[N]
    metallic: jnp.ndarray  # f32[N]
    diffuse: jnp.ndarray  # f32[N]
    specular: jnp.ndarray  # f32[N]
    specular_exponent: jnp.ndarray  # f32[N]

    @staticmethod
    def create(
        color,
        metallic=0.5,
        ambient=0.1,
        diffuse=0.9,
        specular=0.4,
        specular_exponent=50.0,
    ) -> "Materials":
        """Build a stacked material set; defaults match the reference
        constructor signature (scene.h:48)."""
        color = jnp.atleast_2d(_f32(color))
        n = color.shape[0]

        def bc(v):
            return jnp.broadcast_to(_f32(v), (n,))

        return Materials(
            color=color,
            ambient=bc(ambient),
            metallic=bc(metallic),
            diffuse=bc(diffuse),
            specular=bc(specular),
            specular_exponent=bc(specular_exponent),
        )

    def take(self, idx: jnp.ndarray) -> "Materials":
        """Gather per-ray materials for winning primitive indices."""
        return Materials(
            color=jnp.take(self.color, idx, axis=0, mode="clip"),
            ambient=jnp.take(self.ambient, idx, mode="clip"),
            metallic=jnp.take(self.metallic, idx, mode="clip"),
            diffuse=jnp.take(self.diffuse, idx, mode="clip"),
            specular=jnp.take(self.specular, idx, mode="clip"),
            specular_exponent=jnp.take(self.specular_exponent, idx, mode="clip"),
        )

    @staticmethod
    def concat(parts: Sequence["Materials"]) -> "Materials":
        return Materials(
            *[
                jnp.concatenate([getattr(p, f.name) for p in parts], axis=0)
                for f in dataclasses.fields(Materials)
            ]
        )

    def __len__(self) -> int:
        return self.ambient.shape[0]


# Default material, matching DEFAULT_MAT (scene.h:3): Material(RGB(1,1,1), .9, .9, .3, 30)
# i.e. metallic=.9, ambient=.9, diffuse=.3, specular=30, exponent=50 (the
# reference positional-arg quirk documented in SURVEY.md row 4).
def default_material() -> Materials:
    return Materials.create(
        color=[[1.0, 1.0, 1.0]],
        metallic=0.9,
        ambient=0.9,
        diffuse=0.3,
        specular=30.0,
        specular_exponent=50.0,
    )


@pytree_dataclass
class Spheres:
    """Stacked sphere primitives (reference: scene.h:75-84)."""

    center: jnp.ndarray  # f32[N, 3]
    radius: jnp.ndarray  # f32[N]
    material: Materials  # fields of length N

    @staticmethod
    def create(center, radius, material: Materials) -> "Spheres":
        center = jnp.atleast_2d(_f32(center))
        radius = jnp.broadcast_to(_f32(radius), (center.shape[0],))
        return Spheres(center=center, radius=radius, material=material)

    def __len__(self) -> int:
        return self.radius.shape[0]

    @staticmethod
    def empty() -> "Spheres":
        return Spheres(
            center=jnp.zeros((0, 3), jnp.float32),
            radius=jnp.zeros((0,), jnp.float32),
            material=Materials.create(jnp.zeros((0, 3), jnp.float32)),
        )


@pytree_dataclass
class Walls:
    """Stacked finite-rectangle primitives (reference: scene.h:62-73).

    A wall is a corner ``position``, a unit ``normal``, and in-plane extents
    ``length`` x ``width``. The in-plane basis follows the reference
    (scene.cpp:18-19): ``right = normalize(cross(normal, z))``,
    ``up = normalize(cross(right, normal))`` — degenerate for normals parallel
    to z, exactly as in the reference.
    """

    position: jnp.ndarray  # f32[M, 3]
    normal: jnp.ndarray  # f32[M, 3] unit
    length: jnp.ndarray  # f32[M]
    width: jnp.ndarray  # f32[M]
    material: Materials  # fields of length M

    @staticmethod
    def create(position, normal, length, width, material: Materials) -> "Walls":
        position = jnp.atleast_2d(_f32(position))
        m = position.shape[0]
        normal = math3.normalize(jnp.atleast_2d(_f32(normal)))
        return Walls(
            position=position,
            normal=jnp.broadcast_to(normal, (m, 3)),
            length=jnp.broadcast_to(_f32(length), (m,)),
            width=jnp.broadcast_to(_f32(width), (m,)),
            material=material,
        )

    def basis(self) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Per-wall in-plane (right, up) unit vectors (scene.cpp:18-19)."""
        z = jnp.array([0.0, 0.0, 1.0], jnp.float32)
        right = math3.normalize(math3.cross(self.normal, z))
        up = math3.normalize(math3.cross(right, self.normal))
        return right, up

    def __len__(self) -> int:
        return self.length.shape[0]

    @staticmethod
    def empty() -> "Walls":
        return Walls(
            position=jnp.zeros((0, 3), jnp.float32),
            normal=jnp.zeros((0, 3), jnp.float32),
            length=jnp.zeros((0,), jnp.float32),
            width=jnp.zeros((0,), jnp.float32),
            material=Materials.create(jnp.zeros((0, 3), jnp.float32)),
        )


@pytree_dataclass
class Boxes:
    """Stacked axis-aligned box primitives.

    The reference's Sprint-1 ``Box`` class (README.md:28-37) is gone from the
    snapshot; this is its TPU-native successor: min/max corner arrays with a
    branchless slab intersection test. Outside hits only — the entry distance
    ``t_near`` is returned, matching the spheres' nearer-root convention.
    """

    minimum: jnp.ndarray  # f32[N, 3]
    maximum: jnp.ndarray  # f32[N, 3]
    material: Materials  # fields of length N

    @staticmethod
    def create(minimum, maximum, material: Materials) -> "Boxes":
        minimum = jnp.atleast_2d(_f32(minimum))
        maximum = jnp.atleast_2d(_f32(maximum))
        return Boxes(
            minimum=jnp.minimum(minimum, maximum),
            maximum=jnp.maximum(minimum, maximum),
            material=material,
        )

    def __len__(self) -> int:
        return self.minimum.shape[0]

    @staticmethod
    def empty() -> "Boxes":
        return Boxes(
            minimum=jnp.zeros((0, 3), jnp.float32),
            maximum=jnp.zeros((0, 3), jnp.float32),
            material=Materials.create(jnp.zeros((0, 3), jnp.float32)),
        )


@pytree_dataclass
class Lights:
    """Point lights plus sun (directional) lights.

    The reference hard-codes one white point light at the origin
    (main.cpp:14) and #defines but never uses a sun (main.cpp:18-19); the
    README claims the sun as a Sprint-3 feature, so it is first-class here.
    ``sun_direction`` points *toward* the sun. Sun arrays are ``[S, 3]``
    with S = 0 disabling the sun *statically* — sunless scenes (like the
    reference snapshot) compile shading with no sun terms at all.
    """

    point_position: jnp.ndarray  # f32[L, 3]
    point_color: jnp.ndarray  # f32[L, 3]
    sun_direction: jnp.ndarray  # f32[S, 3] (toward the sun; need not be unit)
    sun_color: jnp.ndarray  # f32[S, 3]

    @staticmethod
    def create(
        point_position=((0.0, 0.0, 0.0),),
        point_color=((1.0, 1.0, 1.0),),
        sun_direction=(0.7, 0.4, 0.7),
        sun_color=None,
    ) -> "Lights":
        """``sun_color=None`` (or all zeros) statically disables the sun."""
        if sun_color is None or not np.any(np.asarray(sun_color)):
            sun_direction = jnp.zeros((0, 3), jnp.float32)
            sun_color = jnp.zeros((0, 3), jnp.float32)
        return Lights(
            point_position=jnp.atleast_2d(_f32(point_position)),
            point_color=jnp.atleast_2d(_f32(point_color)),
            sun_direction=jnp.atleast_2d(_f32(sun_direction)),
            sun_color=jnp.atleast_2d(_f32(sun_color)),
        )


@pytree_dataclass
class Sky:
    """Sky-gradient + flat-ground background (reference: main.cpp:15-17, 28-37).

    Rays with direction z < 0 see ``ground_color``; others see
    ``lerp(horizon_color, zenith_color, pow(dir_z, gradient_exponent))``.
    """

    ground_color: jnp.ndarray  # f32[3]
    horizon_color: jnp.ndarray  # f32[3]  (reference SKYCOLOR_LOW)
    zenith_color: jnp.ndarray  # f32[3]  (reference SKYCOLOR_HIGH)
    gradient_exponent: jnp.ndarray  # f32[]

    @staticmethod
    def create(
        ground_color=(0.025, 0.05, 0.075),
        horizon_color=(0.36, 0.45, 0.57),
        zenith_color=(0.14, 0.21, 0.49),
        gradient_exponent=0.25,
    ) -> "Sky":
        return Sky(
            ground_color=_f32(ground_color),
            horizon_color=_f32(horizon_color),
            zenith_color=_f32(zenith_color),
            gradient_exponent=_f32(gradient_exponent),
        )


@pytree_dataclass
class Scene:
    """The full differentiable scene: primitives + lights + background."""

    spheres: Spheres
    walls: Walls
    boxes: Boxes
    lights: Lights
    sky: Sky

    @staticmethod
    def create(
        spheres: Spheres | None = None,
        walls: Walls | None = None,
        boxes: "Boxes | None" = None,
        lights: Lights | None = None,
        sky: Sky | None = None,
    ) -> "Scene":
        return Scene(
            spheres=spheres if spheres is not None else Spheres.empty(),
            walls=walls if walls is not None else Walls.empty(),
            boxes=boxes if boxes is not None else Boxes.empty(),
            lights=lights if lights is not None else Lights.create(),
            sky=sky if sky is not None else Sky.create(),
        )

    @property
    def num_primitives(self) -> int:
        return len(self.spheres) + len(self.walls) + len(self.boxes)


@pytree_dataclass
class Camera:
    """Pinhole look-at camera parameters (reference: scene.h:86-112).

    Image dimensions are *not* stored here — they are static shape arguments
    to ``render`` so the same differentiable camera pytree works at any
    resolution under one jit trace.
    """

    position: jnp.ndarray  # f32[3]
    lookat: jnp.ndarray  # f32[3]
    vup: jnp.ndarray  # f32[3]
    vfov: jnp.ndarray  # f32[] vertical field of view, degrees
    # Per-camera movement step, a scene datum like the reference's
    # ``Camera::movement_speed`` (scene.h:95, set to 0.1 at main.cpp:149) —
    # a pytree leaf, so it is configurable per config and differentiable.
    movement_speed: jnp.ndarray = dataclasses.field(
        default_factory=lambda: _f32(0.1)
    )  # f32[]

    @staticmethod
    def create(
        position=(0.0, 0.0, 0.0),
        lookat=(-1.0, 0.0, 0.0),
        vup=(0.0, 0.0, -1.0),
        vfov=90.0,
        movement_speed=0.1,
    ) -> "Camera":
        return Camera(
            position=_f32(position),
            lookat=_f32(lookat),
            vup=_f32(vup),
            vfov=_f32(vfov),
            movement_speed=_f32(movement_speed),
        )


@pytree_dataclass
class CameraFrame:
    """Derived per-frame ray-generation anchors (reference: scene.cpp:80-106).

    The reference's ``Camera::init`` computes these once and *keeps them stale*
    after movement; here they are recomputed functionally from ``Camera`` on
    every render, which is free under jit fusion.
    """

    origin: jnp.ndarray  # f32[3] camera position
    image_top_left: jnp.ndarray  # f32[3] center of pixel (0, 0)
    pixel_delta_x: jnp.ndarray  # f32[3]
    pixel_delta_y: jnp.ndarray  # f32[3]
