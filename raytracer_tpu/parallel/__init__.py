"""Multi-chip parallelism: device meshes, sharded rendering, distributed fit.

The reference parallelizes with OpenMP threads over scanlines on one CPU
(reference: README.md:13,17) and has no communication backend (SURVEY.md §2).
The TPU-native equivalent is a 2-D ``jax.sharding.Mesh``:

* axis ``'px'`` — data parallelism over pixel rows (the scanline split,
  reborn as ``shard_map`` sharding); rays never communicate, so this axis
  scales embarrassingly across chips/hosts over ICI/DCN.
* axis ``'prim'`` — optional tensor-parallel sharding of the *sphere* axis
  for scenes whose primitive count dwarfs VMEM; per-shard closest hits are
  combined with an ``all_gather`` + argmin over the axis.

Scene/material/light parameters are replicated; the distributed fit loop
``psum``s parameter gradients across the mesh (handled by ``shard_map``'s
transpose of the replicated in-spec), overlapped by XLA with the backward
bounce scan.
"""

from raytracer_tpu.parallel.hosts import initialize_distributed, is_multi_host, slice_mesh
from raytracer_tpu.parallel.mesh import make_mesh, pad_scene_spheres, scene_pspecs
from raytracer_tpu.parallel.render import render_sharded
from raytracer_tpu.parallel.train import FitState, make_fit_step

__all__ = [
    "initialize_distributed",
    "is_multi_host",
    "slice_mesh",
    "make_mesh",
    "pad_scene_spheres",
    "scene_pspecs",
    "render_sharded",
    "FitState",
    "make_fit_step",
]
