"""Run configuration: the data layer the reference lacks.

The reference configures everything at compile time — ``#define``s for
render mode/light/sky constants (main.cpp:12-19), ``const``s for
width/logging (main.cpp:22-25), a hard-coded scene (main.cpp:156-163), and a
default-argument recursion depth (main.cpp:89). ``RenderConfig`` expresses
all of that as data, including the five BASELINE.json benchmark configs.
"""

from __future__ import annotations

import dataclasses
from typing import Any

from raytracer_tpu.core.types import Camera, Scene
from raytracer_tpu.models import scenes

__all__ = ["RenderConfig", "BASELINE_CONFIGS", "get_config"]


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """One render/benchmark workload, fully data-driven."""

    name: str
    scene: str  # scene factory name in models.scenes, or "demo"/"sprint3"
    scene_args: dict = dataclasses.field(default_factory=dict)
    width: int = 640
    height: int = 640
    depth: int = 3  # reflection bounces (reference default 10, main.cpp:89)
    tonemap: bool = True
    depth_only: bool = False
    fold: str = "auto"  # closest-hit backend: auto | jnp | pallas
    # differentiable-fit settings (BASELINE config 4)
    fit: bool = False
    fit_steps: int = 200
    fit_lr: float = 2e-2
    # multi-device mesh: (px, prim), "auto" (all local devices on the px
    # axis when more than one is present), or None = single device
    mesh: tuple[int, int] | str | None = None

    def build_mesh(self):
        """Resolve the mesh spec to a ``jax.sharding.Mesh`` (or None)."""
        if self.mesh is None:
            return None
        import jax

        from raytracer_tpu.parallel.hosts import slice_mesh

        if self.mesh == "auto":
            return slice_mesh() if jax.device_count() > 1 else None
        px, prim = self.mesh
        mesh = slice_mesh(prim=prim)
        if px is not None and mesh.shape["px"] != px:
            raise ValueError(
                f"mesh {px}x{prim} != {jax.device_count()} devices"
            )
        return mesh

    def build_scene(self) -> Scene:
        factory = {
            "demo": scenes.reference_demo_scene,
            "sprint3": scenes.sprint3_scene,
            "grid": scenes.grid_sphere_scene,
            "random": scenes.random_sphere_scene,
            "logo": scenes.logo_sphere_scene,
            "mixed": scenes.mixed_primitive_scene,
        }[self.scene]
        return factory(**self.scene_args)

    def build_camera(self) -> Camera:
        return scenes.reference_demo_camera()

    def replace(self, **kw) -> "RenderConfig":
        return dataclasses.replace(self, **kw)


# The five benchmark configurations from BASELINE.json `configs`, plus the
# reference's own default workload (ref-demo-640-d10).
BASELINE_CONFIGS: dict[str, RenderConfig] = {
    c.name: c
    for c in [
        RenderConfig(
            name="c1-depth-pass",
            scene="demo",
            width=320, height=240, depth=0, depth_only=True, tonemap=False,
        ),
        RenderConfig(
            name="c2-sprint3-1bounce",
            scene="sprint3",
            width=640, height=480, depth=1,
        ),
        RenderConfig(
            name="c3-1080p-3bounce",
            scene="sprint3",
            width=1920, height=1080, depth=3,
        ),
        RenderConfig(
            name="c4-fit-64sphere",
            scene="grid", scene_args={"n": 64},
            width=1920, height=1080, depth=1, fit=True,
        ),
        RenderConfig(
            # The reference's TRUE default workload: 640x640 (int-division
            # aspect quirk, main.cpp:25 + scene.cpp:82), depth 10
            # (main.cpp:89), the hard-coded demo scene (main.cpp:156-163).
            # Driver artifact: bench.py `frame_ms_ref_demo_640_d10`.
            name="ref-demo-640-d10",
            scene="demo",
            width=640, height=640, depth=10,
        ),
        RenderConfig(
            name="c5-4k-1024sphere",
            # BASELINE: "multi-host pixel-tile sharding" — the mesh resolves
            # to every local device (px axis) when more than one is present,
            # single-chip otherwise.
            scene="grid", scene_args={"n": 1024},
            width=3840, height=2160, depth=4, mesh="auto",
        ),
    ]
}


def get_config(name: str, **overrides: Any) -> RenderConfig:
    cfg = BASELINE_CONFIGS[name]
    return cfg.replace(**overrides) if overrides else cfg
