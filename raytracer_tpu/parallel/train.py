"""Distributed differentiable-rendering fit loop.

BASELINE config 4: fit sphere centers/colors (any differentiable scene leaf)
to a target image by gradient descent through the renderer. The reference has
no training of any kind — differentiability is the north-star capability the
TPU rebuild adds (BASELINE.json) on top of the reference's forward pipeline.

Parallel layout: pixels shard over the mesh (each device computes its rows'
loss term), parameters are replicated, and the parameter-gradient all-reduce
(``psum``) falls out of ``shard_map``'s transpose of the replicated in-spec —
XLA overlaps it with the backward bounce scan.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from raytracer_tpu.core.types import Camera, Scene, pytree_dataclass
from raytracer_tpu.parallel.render import render_sharded_impl, render_soft_sharded_impl
from raytracer_tpu.render.integrator import render

__all__ = ["FitState", "make_fit_step", "default_params", "merge_params"]


@pytree_dataclass
class FitState:
    """Optimizer + parameter state for the fit loop (checkpointable pytree)."""

    params: Any
    opt_state: Any
    step: jnp.ndarray  # i32[]


def default_params(scene: Scene) -> dict:
    """The standard fit parameterization: sphere centers and albedos."""
    return {
        "center": scene.spheres.center,
        "color": scene.spheres.material.color,
    }


def merge_params(scene: Scene, params: dict) -> Scene:
    """Write fit parameters back into the (otherwise static) scene pytree."""
    spheres = scene.spheres
    if "center" in params:
        spheres = spheres.replace(center=params["center"])
    if "color" in params:
        spheres = spheres.replace(
            material=spheres.material.replace(color=params["color"])
        )
    if "radius" in params:
        spheres = spheres.replace(radius=params["radius"])
    return scene.replace(spheres=spheres)


def make_fit_step(
    width: int,
    height: int,
    *,
    mesh: jax.sharding.Mesh | None = None,
    depth: int = 1,
    learning_rate: float = 2e-2,
    tonemap: bool = True,
    optimizer: optax.GradientTransformation | None = None,
    merge: Callable[[Scene, Any], Scene] = merge_params,
    params_fn: Callable[[Scene], Any] = default_params,
    soft: bool = False,
    soft_tau: float = 0.01,
    soft_tau_z: float = 0.05,
) -> tuple[Callable, Callable]:
    """Build ``(init_fn, step_fn)`` for the differentiable fit.

    ``init_fn(scene) -> FitState`` and
    ``step_fn(state, scene, camera, target) -> (state, loss)`` — one jitted
    forward+backward+update. With a ``mesh`` the render shards pixels across
    it and the gradient all-reduce rides the mesh's collectives; without one
    it runs single-device.
    """
    opt = optimizer if optimizer is not None else optax.adam(learning_rate)

    def loss_fn(params, scene, camera, target):
        full = merge(scene, params)
        if soft:
            # Geometry fits need soft visibility (silhouette gradients).
            # `depth` is honored: soft reflections (diff/soft.py) make
            # mirror-seen geometry fittable too.
            if mesh is not None:
                img = render_soft_sharded_impl(
                    full, camera, width, height, mesh=mesh,
                    tau=soft_tau, tau_z=soft_tau_z, tonemap=tonemap,
                    depth=depth,
                )
            else:
                from raytracer_tpu.diff.soft import render_soft

                img = render_soft(
                    full, camera, width, height,
                    tau=soft_tau, tau_z=soft_tau_z, tonemap=tonemap,
                    depth=depth,
                )
        elif mesh is not None:
            img = render_sharded_impl(
                full, camera, width, height, mesh=mesh, depth=depth, tonemap=tonemap
            )
        else:
            img = render(full, camera, width, height, depth=depth, tonemap=tonemap)
        return jnp.mean((img - target) ** 2)

    def init_fn(scene: Scene) -> FitState:
        params = params_fn(scene)
        return FitState(
            params=params,
            opt_state=opt.init(params),
            step=jnp.zeros((), jnp.int32),
        )

    @jax.jit
    def step_fn(state: FitState, scene: Scene, camera: Camera, target: jnp.ndarray):
        loss, grads = jax.value_and_grad(loss_fn)(
            state.params, scene, camera, target
        )
        updates, opt_state = opt.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        return FitState(params=params, opt_state=opt_state, step=state.step + 1), loss

    return init_fn, step_fn
