"""Device mesh construction and scene partition specs.

The 2-D mesh axes are ``('px', 'prim')``: pixel-row data parallelism and
optional primitive (sphere-axis) tensor parallelism. ``prim=1`` gives pure
pixel sharding — the TPU rebirth of the reference's OpenMP scanline split
(reference: README.md:13).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from raytracer_tpu.core.types import Boxes, Lights, Materials, Scene, Sky, Spheres, Walls

__all__ = ["make_mesh", "scene_pspecs", "pad_scene_spheres", "PX_AXIS", "PRIM_AXIS"]

PX_AXIS = "px"
PRIM_AXIS = "prim"


def make_mesh(px: int | None = None, prim: int = 1, devices=None) -> Mesh:
    """A ``(px, prim)`` mesh over ``devices`` (default: all of them).

    With ``px=None`` the pixel axis absorbs all devices not used by ``prim``.
    On real hardware the px axis should span hosts (DCN) *outermost* so the
    prim-axis all_gather rides ICI within a host.
    """
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if px is None:
        if n % prim:
            raise ValueError(f"{n} devices not divisible by prim={prim}")
        px = n // prim
    if px * prim != n:
        raise ValueError(f"mesh {px}x{prim} != {n} devices")
    return Mesh(devices.reshape(px, prim), (PX_AXIS, PRIM_AXIS))


def _mat_specs(spec: P) -> Materials:
    return Materials(*([spec] * 6))


def scene_pspecs() -> Scene:
    """Partition-spec pytree for a Scene under ``shard_map``.

    Spheres shard their leading (primitive) axis over ``'prim'``; walls,
    lights, and sky are replicated (walls are few; duplicate wall hits
    combine idempotently through the min-reduction).
    """
    prim = P(PRIM_AXIS)
    rep = P()
    return Scene(
        spheres=Spheres(center=prim, radius=prim, material=_mat_specs(prim)),
        walls=Walls(
            position=rep, normal=rep, length=rep, width=rep, material=_mat_specs(rep)
        ),
        boxes=Boxes(minimum=rep, maximum=rep, material=_mat_specs(rep)),
        lights=Lights(*([rep] * 4)),
        sky=Sky(*([rep] * 4)),
    )


def pad_scene_spheres(scene: Scene, multiple: int) -> Scene:
    """Pad the sphere axis to a multiple of ``multiple`` with never-hit spheres.

    Pad spheres sit at 1e8 with radius 0, so the discriminant is negative for
    every real ray (guaranteed miss); their parameters receive zero gradient.
    """
    n = len(scene.spheres)
    pad = -n % multiple
    if pad == 0:
        return scene
    s = scene.spheres

    def pad_leaf(x, fill):
        shape = (pad,) + x.shape[1:]
        return jnp.concatenate([x, jnp.full(shape, fill, x.dtype)], axis=0)

    spheres = Spheres(
        center=pad_leaf(s.center, 1e8),
        radius=pad_leaf(s.radius, 0.0),
        material=jax.tree_util.tree_map(lambda x: pad_leaf(x, 0.0), s.material),
    )
    return scene.replace(spheres=spheres)
