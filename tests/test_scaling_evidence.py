"""Compiled-program scaling invariants (round-2 VERDICT item 5).

The ≥90%-at-2-hosts BASELINE claim rests on what the compiled sharded
programs COMMUNICATE, not on wall time from 8 virtual devices timesharing
one CPU. These tests pin the two load-bearing facts on the 8-device mesh:

1. the pixel-row-sharded render compiles to ZERO collective ops — rays
   never communicate and the output tiling is layout, not traffic;
2. the sharded training step's only cross-mesh collective is the parameter
   gradient all-reduce, whose payload is exactly O(parameter bytes) —
   kilobytes against megabytes of per-shard pixel work.
"""

import importlib.util
import os

import jax
import jax.numpy as jnp

_spec = importlib.util.spec_from_file_location(
    "scaling_evidence",
    os.path.join(os.path.dirname(__file__), "..", "tools",
                 "scaling_evidence.py"),
)
_mod = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_mod)
collective_inventory = _mod.collective_inventory

from raytracer_tpu.models.scenes import (  # noqa: E402
    grid_sphere_scene,
    reference_demo_camera,
)
from raytracer_tpu.parallel.mesh import make_mesh  # noqa: E402
from raytracer_tpu.parallel.render import render_sharded  # noqa: E402
from raytracer_tpu.parallel.train import make_fit_step  # noqa: E402

W, H = 128, 96


def _collectives(lowered):
    return collective_inventory(lowered.compile().as_text())


def test_px_sharded_render_has_zero_collectives():
    scene = grid_sphere_scene(16)
    camera = reference_demo_camera()
    mesh = make_mesh(px=8, prim=1)
    inv = _collectives(
        jax.jit(
            lambda s, c: render_sharded(s, c, W, H, mesh=mesh, depth=1)
        ).lower(scene, camera)
    )
    assert inv == [], f"render path must not communicate, got {inv}"


def test_fit_step_collective_payload_is_param_sized():
    scene = grid_sphere_scene(16)
    camera = reference_demo_camera()
    mesh = make_mesh(px=8, prim=1)
    init_fn, step_fn = make_fit_step(W, H, mesh=mesh, depth=1)
    state = init_fn(scene)
    target = jnp.zeros((H, W, 3), jnp.float32)
    inv = _collectives(
        jax.jit(step_fn).lower(state, scene, camera, target)
    )
    param_bytes = (
        scene.spheres.center.size + scene.spheres.material.color.size
    ) * 4
    total = sum(c["payload_bytes"] for c in inv)
    # gradient all-reduce (params) + the scalar loss mean — nothing else,
    # and in particular nothing proportional to the (H*W*3*4 = 147k) image.
    assert total <= param_bytes + 64, (total, param_bytes, inv)
    assert all(c["op"] == "all-reduce" for c in inv), inv
