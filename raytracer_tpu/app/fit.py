"""Differentiable-fit driver (BASELINE config 4).

Self-contained inverse-rendering demo: render a target image of the true
scene with the HARD renderer (the production forward path — the target is
NOT produced by the model being fitted), perturb sphere centers/colors,
then recover them by Adam through the soft-visibility renderer
(diff/soft.py — hard argmin visibility has no silhouette gradients), at the
config's reflection depth. Checkpoints optimizer state every few steps
(utils/checkpoint.py) and exports target/initial/final frames.
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import optax

from raytracer_tpu.app.config import RenderConfig
from raytracer_tpu.diff import render_soft
from raytracer_tpu.io import save_png
from raytracer_tpu.utils.checkpoint import load_pytree, save_pytree

__all__ = ["run_fit"]


def run_fit(
    cfg: RenderConfig,
    *,
    steps: int = 200,
    lr: float = 2e-2,
    perturb: float = 0.15,
    soft_tau: float = 0.01,
    out_dir: Path = Path("fit_out"),
    resume: str | None = None,
    checkpoint_every: int = 50,
    log_every: int = 10,
) -> int:
    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    metrics_path = out_dir / "metrics.jsonl"  # structured per-step metrics
    metrics_file = open(metrics_path, "a")
    w, h = cfg.width, cfg.height

    truth = cfg.build_scene()
    camera = cfg.build_camera()
    # The target comes from the hard renderer — recovering geometry from an
    # image the soft model did NOT produce is the actual inverse-rendering
    # capability (the soft render converges to hard as tau -> 0).
    from raytracer_tpu.render.integrator import render

    depth = cfg.depth
    target = render(truth, camera, w, h, depth=depth, tonemap=cfg.tonemap)
    save_png(out_dir / "target.png", np.asarray(target))

    rng = np.random.default_rng(0)
    n = len(truth.spheres)
    params = {
        "center": truth.spheres.center
        + jnp.asarray(rng.uniform(-perturb, perturb, (n, 3)), jnp.float32),
        "color": jnp.clip(
            truth.spheres.material.color
            + jnp.asarray(rng.uniform(-perturb, perturb, (n, 3)), jnp.float32),
            0.0,
            1.0,
        ),
    }
    # Cosine-decayed Adam: a constant lr=2e-2 oscillates around the optimum
    # late in the fit (observed on the c4 run: loss bouncing 7e-5..1.2e-4
    # and center error creeping back up after step ~200); decaying to
    # lr/20 converges past the plateau.
    opt = optax.adam(
        optax.cosine_decay_schedule(lr, decay_steps=max(steps, 1), alpha=0.05)
    )
    state = {"params": params, "opt": opt.init(params), "step": jnp.int32(0)}
    if resume:
        state = load_pytree(resume, state)

    def apply(scene, p):
        spheres = scene.spheres.replace(
            center=p["center"],
            material=scene.spheres.material.replace(color=p["color"]),
        )
        return scene.replace(spheres=spheres)

    @jax.jit
    def step_fn(state):
        # Coarse-to-fine tau annealing (soft-rasterizer style): start 4x
        # softer so far-off silhouettes still overlap and pull, decay
        # exponentially to the target sharpness by ~60% of the run. tau is
        # a traced value, so the anneal costs no recompiles.
        frac = jnp.minimum(
            state["step"].astype(jnp.float32) / (0.6 * max(steps, 1)), 1.0
        )
        tau_k = soft_tau * jnp.exp(jnp.log(4.0) * (1.0 - frac))

        def loss_fn(p):
            img = render_soft(
                apply(truth, p), camera, w, h, tau=tau_k,
                tonemap=cfg.tonemap, depth=depth,
            )
            return jnp.mean((img - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(state["params"])
        updates, opt_state = opt.update(grads, state["opt"], state["params"])
        params = optax.apply_updates(state["params"], updates)
        return {"params": params, "opt": opt_state, "step": state["step"] + 1}, loss

    save_png(
        out_dir / "initial.png",
        np.asarray(
            render_soft(
                apply(truth, state["params"]), camera, w, h,
                tau=soft_tau, tonemap=cfg.tonemap, depth=depth,
            )
        ),
    )

    t0 = time.perf_counter()
    for i in range(steps):
        state, loss = step_fn(state)
        if (i + 1) % log_every == 0 or i == 0:
            err = float(
                jnp.abs(state["params"]["center"] - truth.spheres.center).mean()
            )
            line = json.dumps(
                {
                    "step": int(state["step"]),
                    "loss": float(loss),
                    "center_err": err,
                    "elapsed_s": round(time.perf_counter() - t0, 2),
                }
            )
            print(line, flush=True)
            metrics_file.write(line + "\n")
            metrics_file.flush()
        if (i + 1) % checkpoint_every == 0:
            save_pytree(out_dir / "checkpoint.npz", state)

    save_pytree(out_dir / "checkpoint.npz", state)
    final_img = np.asarray(
        render_soft(
            apply(truth, state["params"]), camera, w, h,
            tau=soft_tau, tonemap=cfg.tonemap, depth=depth,
        )
    )
    save_png(out_dir / "final.png", final_img)
    # Recovered-scene fidelity vs the target on the PRODUCTION (hard)
    # renderer — the honest measure: did the recovered geometry reproduce
    # the image the hard renderer made, not just the soft surrogate.
    hard_final = np.asarray(
        render(apply(truth, state["params"]), camera, w, h,
               depth=depth, tonemap=cfg.tonemap)
    )
    save_png(out_dir / "final_hard.png", hard_final)
    mse_hard = float(np.mean((hard_final - np.asarray(target)) ** 2))
    psnr = float(10.0 * np.log10(1.0 / max(mse_hard, 1e-12)))
    final_err = float(jnp.abs(state["params"]["center"] - truth.spheres.center).mean())
    line = json.dumps(
        {"final_center_err": final_err, "final_loss": float(loss),
         "psnr_hard_db": round(psnr, 2)}
    )
    print(line)
    metrics_file.write(line + "\n")
    metrics_file.close()
    return 0
