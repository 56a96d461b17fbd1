"""Scene definitions: the reference demo scene and procedural families.

The reference hard-codes its scene in ``main`` (main.cpp:146-163); its README
screenshots show a larger procedural scene (~100 reflective spheres forming a
logo, images/Sprint3.png). This module provides both as data: the exact demo
scene for golden-image parity, plus procedural N-sphere generators used by
the BASELINE configs (64-sphere fit, 1024-sphere 4K multi-host).

All constructors are host-side (NumPy) and return Scene/Camera pytrees.
"""

from __future__ import annotations

import numpy as np

from raytracer_tpu.core.types import (
    Camera,
    Lights,
    Materials,
    Scene,
    Sky,
    Spheres,
    Walls,
)

__all__ = [
    "reference_demo_scene",
    "reference_demo_camera",
    "sprint3_scene",
    "grid_sphere_scene",
    "random_sphere_scene",
    "logo_sphere_scene",
    "mixed_primitive_scene",
    "morton_sort_spheres",
]


def _morton_key(q: np.ndarray) -> np.ndarray:
    """Interleave 10-bit quantized xyz coords into a 30-bit Morton code."""

    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << 16)) & np.uint64(0x030000FF)
        v = (v | (v << 8)) & np.uint64(0x0300F00F)
        v = (v | (v << 4)) & np.uint64(0x030C30C3)
        v = (v | (v << 2)) & np.uint64(0x09249249)
        return v

    return spread(q[:, 0]) | (spread(q[:, 1]) << np.uint64(1)) | (
        spread(q[:, 2]) << np.uint64(2)
    )


def morton_sort_spheres(spheres: Spheres) -> Spheres:
    """Reorder spheres along a Morton (Z-order) curve of their centers.

    Consecutive spheres become spatially adjacent, so the 8-sphere chunks the
    fold kernels cull over get compact AABBs (an unsorted grid row's chunk
    spans the whole row — ~4x looser). Pure host-side permutation: the sphere
    SET is unchanged, only internal indices move, and every fold/oracle path
    numbers primitives from the same stored order.
    """
    c = np.asarray(spheres.center)
    if len(c) <= 8:
        return spheres
    lo, hi = c.min(axis=0), c.max(axis=0)
    q = ((c - lo) / np.maximum(hi - lo, 1e-9) * 1023.0).astype(np.uint32)
    order = np.argsort(_morton_key(q), kind="stable")
    return Spheres.create(
        center=c[order],
        radius=np.asarray(spheres.radius)[order],
        material=Materials.create(
            color=np.asarray(spheres.material.color)[order],
            ambient=np.asarray(spheres.material.ambient)[order],
            metallic=np.asarray(spheres.material.metallic)[order],
            diffuse=np.asarray(spheres.material.diffuse)[order],
            specular=np.asarray(spheres.material.specular)[order],
            specular_exponent=np.asarray(spheres.material.specular_exponent)[order],
        ),
    )

# Reference constants (main.cpp:14-19).
LIGHT_POS = (0.0, 0.0, 0.0)
SUN_COLOR = (1.64, 1.27, 0.99)
SUN_DIRECTION = (0.7, 0.4, 0.7)


def reference_demo_scene(*, sun: bool = False) -> Scene:
    """The exact scene built in the reference ``main`` (main.cpp:156-163).

    One green metallic sphere between a blue 1x1 wall and a green 2x2 wall,
    lit by the white point light at the origin (main.cpp:14). ``sun=True``
    additionally enables the Sprint-3 sun light (main.cpp:18-19, unused in
    the reference snapshot).
    """
    spheres = Spheres.create(
        center=[[1.5, 0.0, 0.0]],
        radius=[0.5],
        material=Materials.create(color=[[0.0, 1.0, 0.0]], metallic=0.5),
    )
    walls = Walls.create(
        position=[[3.0, 2.0, 0.0], [3.0, -3.0, 0.0]],
        normal=[[0.0, -1.0, 0.0], [0.0, 1.0, 0.0]],
        length=[1.0, 2.0],
        width=[1.0, 2.0],
        material=Materials.create(color=[[0.0, 0.0, 1.0], [0.0, 1.0, 0.0]]),
    )
    lights = Lights.create(
        point_position=[LIGHT_POS],
        point_color=[(1.0, 1.0, 1.0)],
        sun_direction=SUN_DIRECTION,
        sun_color=SUN_COLOR if sun else None,
    )
    return Scene.create(spheres=spheres, walls=walls, lights=lights, sky=Sky.create())


def reference_demo_camera() -> Camera:
    """The reference camera pose (main.cpp:146-153): at the origin, looking
    at -x with vup -z, 90 degree vertical FOV."""
    return Camera.create(
        position=(0.0, 0.0, 0.0),
        lookat=(-1.0, 0.0, 0.0),
        vup=(0.0, 0.0, -1.0),
        vfov=90.0,
    )


def sprint3_scene() -> Scene:
    """Sprint-3-style scene: the demo geometry with the sun light enabled
    (BASELINE config 2: "sphere + 3d walls + sun + sky")."""
    return reference_demo_scene(sun=True)


def _floor_walls() -> Walls:
    """A large ground slab below the spheres (the Sprint3.png screenshot shows
    spheres floating over the sky-gradient ground; a real wall gives the
    renderer geometry to reflect)."""
    return Walls.create(
        position=[[-4.0, -10.0, 1.2]],
        # Exact z-normals are degenerate in the wall basis (scene.cpp:18);
        # a tiny y tilt keeps cross(normal, z) well-defined.
        normal=[[0.0, 1e-3, -1.0]],
        length=[20.0],
        width=[20.0],
        material=Materials.create(color=[[0.4, 0.4, 0.45]], metallic=0.2),
    )


def grid_sphere_scene(
    n: int,
    *,
    spacing: float = 1.2,
    radius: float = 0.5,
    distance: float = 8.0,
    metallic: float = 0.6,
    seed: int = 0,
) -> Scene:
    """``n`` reflective spheres in a jittered grid facing the camera.

    Procedural stand-in for the Sprint3.png logo scene; used by BASELINE
    configs 4 (n=64) and 5 (n=1024). The grid spans the y/z plane at x =
    ``distance`` (the camera looks along -x but rays travel along +x due to
    the replicated direction flip, main.cpp:133).
    """
    rng = np.random.default_rng(seed)
    side = int(np.ceil(np.sqrt(n)))
    ys, zs = np.meshgrid(np.arange(side), np.arange(side), indexing="ij")
    ys = (ys.ravel()[:n] - (side - 1) / 2.0) * spacing
    zs = (zs.ravel()[:n] - (side - 1) / 2.0) * spacing
    xs = distance + rng.uniform(-0.3, 0.3, size=n)
    centers = np.stack(
        [xs, ys + rng.uniform(-0.15, 0.15, n), zs + rng.uniform(-0.15, 0.15, n)],
        axis=-1,
    ).astype(np.float32)
    colors = rng.uniform(0.1, 1.0, size=(n, 3)).astype(np.float32)
    spheres = morton_sort_spheres(
        Spheres.create(
            center=centers,
            radius=np.full((n,), radius, np.float32),
            material=Materials.create(color=colors, metallic=metallic),
        )
    )
    lights = Lights.create(
        point_position=[(0.0, 0.0, 0.0)],
        point_color=[(1.0, 1.0, 1.0)],
        sun_direction=SUN_DIRECTION,
        sun_color=SUN_COLOR,
    )
    return Scene.create(spheres=spheres, walls=_floor_walls(), lights=lights)


def random_sphere_scene(n: int, *, extent: float = 12.0, seed: int = 0) -> Scene:
    """``n`` randomly placed/sized/colored spheres in a slab of space."""
    rng = np.random.default_rng(seed)
    centers = np.stack(
        [
            rng.uniform(4.0, 4.0 + extent, n),
            rng.uniform(-extent, extent, n),
            rng.uniform(-extent / 2, extent / 2, n),
        ],
        axis=-1,
    ).astype(np.float32)
    radii = rng.uniform(0.2, 0.8, n).astype(np.float32)
    colors = rng.uniform(0.05, 1.0, (n, 3)).astype(np.float32)
    metallic = rng.uniform(0.1, 0.9, n).astype(np.float32)
    spheres = morton_sort_spheres(
        Spheres.create(
            center=centers,
            radius=radii,
            material=Materials.create(color=colors, metallic=metallic),
        )
    )
    lights = Lights.create(
        point_position=[(0.0, 0.0, 0.0)],
        point_color=[(1.0, 1.0, 1.0)],
        sun_direction=SUN_DIRECTION,
        sun_color=SUN_COLOR,
    )
    return Scene.create(spheres=spheres, walls=_floor_walls(), lights=lights)


# 5x7 bitmap glyphs for the logo scene (1 = sphere).
_GLYPHS = {
    "T": ["#####", "..#..", "..#..", "..#..", "..#..", "..#..", "..#.."],
    "U": ["#...#", "#...#", "#...#", "#...#", "#...#", "#...#", ".###."],
    "M": ["#...#", "##.##", "#.#.#", "#.#.#", "#...#", "#...#", "#...#"],
}


def logo_sphere_scene(
    text: str = "TUM",
    *,
    spacing: float = 0.55,
    radius: float = 0.26,
    distance: float = 7.0,
    metallic: float = 0.7,
) -> Scene:
    """Reflective spheres arranged as block letters — the Sprint3.png scene.

    The reference's Sprint-3 screenshot (images/Sprint3.png, README.md:19)
    shows ~100 reflective spheres forming the TUM logo over the sky-gradient
    ground; the scene itself was swapped out of the snapshot's code
    (SURVEY.md §4), so this reconstructs it procedurally from bitmap glyphs.
    """
    ys, zs = [], []
    x_cursor = 0.0
    # Glyph y-coords are negated below (the direction-flip mirror), which
    # also reverses letter order — so lay the text out right-to-left.
    for ch in reversed(text.upper()):
        glyph = _GLYPHS.get(ch)
        if glyph is None:
            x_cursor += 3 * spacing  # unknown char: blank space
            continue
        for row, line in enumerate(glyph):
            for col, cell in enumerate(line):
                if cell == "#":
                    ys.append(x_cursor + col * spacing)
                    zs.append((3.0 - row) * spacing)  # rows top -> down
        x_cursor += (len(glyph[0]) + 1.5) * spacing
    n = len(ys)
    # Negate y: the replicated direction flip (main.cpp:133) mirrors the
    # image horizontally, so lay the glyphs out pre-mirrored to read
    # correctly on screen.
    ys = -np.asarray(ys, np.float32)
    ys -= ys.mean()  # center horizontally
    centers = np.stack(
        [np.full(n, distance, np.float32), ys, np.asarray(zs, np.float32)],
        axis=-1,
    )
    spheres = Spheres.create(
        center=centers,
        radius=np.full((n,), radius, np.float32),
        material=Materials.create(
            color=np.tile(np.asarray([[0.35, 0.55, 0.95]], np.float32), (n, 1)),
            metallic=metallic,
            ambient=0.25,
        ),
    )
    # Sun from the camera side so the letter faces are lit (rays travel +x).
    lights = Lights.create(
        point_position=[(0.0, 0.0, 0.0)],
        point_color=[(1.0, 1.0, 1.0)],
        sun_direction=(-0.8, 0.2, -0.55),
        sun_color=SUN_COLOR,
    )
    return Scene.create(spheres=spheres, walls=_floor_walls(), lights=lights)


def mixed_primitive_scene(*, sun: bool = True) -> Scene:
    """All three primitive families in one frame: spheres, walls, and boxes.

    Used by tests and as a showcase of the box primitive (the reference's
    Sprint-1 ``Box``, README.md:28-37, rebuilt as axis-aligned slabs).
    """
    from raytracer_tpu.core.types import Boxes

    spheres = Spheres.create(
        center=[[4.0, -1.2, -0.2], [5.0, 1.5, 0.3]],
        radius=[0.6, 0.8],
        material=Materials.create(
            color=[[0.9, 0.3, 0.2], [0.2, 0.8, 0.4]], metallic=0.5
        ),
    )
    boxes = Boxes.create(
        minimum=[[3.2, 0.1, -0.9], [5.5, -2.6, -0.4]],
        maximum=[[4.2, 1.1, 0.1], [6.6, -1.4, 0.8]],
        material=Materials.create(
            color=[[0.95, 0.8, 0.25], [0.4, 0.5, 0.95]], metallic=0.35
        ),
    )
    lights = Lights.create(
        point_position=[(0.0, 0.0, 0.0)],
        point_color=[(1.0, 1.0, 1.0)],
        sun_direction=(-0.8, 0.2, -0.55),
        sun_color=SUN_COLOR if sun else None,
    )
    return Scene.create(
        spheres=spheres, walls=_floor_walls(), boxes=boxes, lights=lights
    )
