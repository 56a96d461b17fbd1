"""Headline benchmark: primary rays/s on the north-star config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Config: 1920x1080, 3 reflection bounces, Reinhard tone mapping, the
reference demo scene (BASELINE config 3). The north-star target is 1e9
primary rays/s on a v5e-8 (BASELINE.json), i.e. 0.125e9 per chip;
``vs_baseline`` is measured single-chip throughput over the per-chip target,
scaled by the local chip count.

Timing method: one warmup (compile), then ``ITERS`` frames chained through a
scalar data dependency (each frame's camera is nudged by the previous
frame's ~0 checksum) with a single device sync at the end — per-call
``block_until_ready`` through the remote-dispatch tunnel measures round-trip
latency, not device time.
"""

import json
import time

import jax
import jax.numpy as jnp

# NOTE: do NOT enable jax's persistent compilation cache here — on this
# remote-compile TPU runtime the cache write path hangs for minutes
# (measured: 20s cold compile without cache, >9min with). Cold compile of
# the 1080p 3-bounce program is ~20-40s, paid once per process.

import raytracer_tpu as rt
from raytracer_tpu.models import scenes

WIDTH, HEIGHT, DEPTH = 1920, 1080, 3
ITERS = 20
BASELINE_RAYS_PER_CHIP = 1e9 / 8  # north star: 1e9 on a v5e-8


def main() -> None:
    n_chips = jax.device_count()
    scene = scenes.reference_demo_scene()
    camera = scenes.reference_demo_camera()

    def step(s, c, eps):
        img = rt.render(
            s, c.replace(vfov=c.vfov + eps), WIDTH, HEIGHT,
            depth=DEPTH, tonemap=True,
        )
        t = img.sum() * 1e-30  # ~0 chain scalar, forces frame completion
        # Sanitize: one inf/NaN pixel would otherwise poison the chained
        # camera and turn later iterations into degenerate (fast, empty)
        # NaN renders — benchmarking nothing (see profiler._chain_timed).
        return jnp.where(jnp.isfinite(t), t, jnp.float32(0))

    f = jax.jit(step)
    eps = jnp.float32(0)
    float(f(scene, camera, eps))  # compile + warm

    t0 = time.perf_counter()
    for _ in range(ITERS):
        eps = f(scene, camera, eps)
    float(eps)  # one sync for the whole chain
    dt = (time.perf_counter() - t0) / ITERS

    rays_per_s = WIDTH * HEIGHT / dt

    # Secondary metrics, each guarded so it can never break the headline
    # line, and budgeted so a relay stall can't starve the driver of the
    # artifact. bwd/fwd is measured WHERE IT HURTS (VERDICT r1 item 5):
    # the flagship 1080p/3-bounce frame on both the <32-prim custom-VJP
    # path (demo scene) and the >=32-prim mm-gather path (grid-64), plus
    # large-scene frame times (1024 spheres at 1080p/3 and the c5 4K/4).
    import os

    budget_s = float(os.environ.get("BENCH_BUDGET_S", "1500"))
    start = time.perf_counter()
    extras: dict = {}

    def within_budget() -> bool:
        return time.perf_counter() - start < budget_s

    def extra(key, fn):
        if not within_budget():
            return
        try:
            extras[key] = fn()
        except Exception:
            extras[key] = float("nan")

    from raytracer_tpu.utils.profiler import (
        benchmark_forward_backward,
        benchmark_render,
    )

    extra(
        "bwd_fwd_ratio",  # flagship: 3-prim demo, custom-VJP take backward
        lambda: round(
            benchmark_forward_backward(
                scene, camera, WIDTH, HEIGHT, depth=DEPTH, iters=3
            )["bwd_fwd_ratio"],
            3,
        ),
    )
    grid64 = scenes.grid_sphere_scene(64)
    extra(
        "bwd_fwd_ratio_grid64",  # >=32 prims: the mm-gather backward
        lambda: round(
            benchmark_forward_backward(
                grid64, camera, WIDTH, HEIGHT, depth=DEPTH, iters=3
            )["bwd_fwd_ratio"],
            3,
        ),
    )
    grid1024 = scenes.grid_sphere_scene(1024)
    extra(
        "frame_ms_1024sphere_1080p_d3",  # VERDICT r1 item 1 artifact
        lambda: round(
            benchmark_render(
                grid1024, camera, WIDTH, HEIGHT, depth=DEPTH, iters=5
            )["frame_ms"],
            2,
        ),
    )
    extra(
        "frame_ms_c5_4k_1024sphere_d4",  # BASELINE config 5 artifact
        lambda: round(
            benchmark_render(
                grid1024, camera, 3840, 2160, depth=4, iters=3
            )["frame_ms"],
            2,
        ),
    )

    print(
        json.dumps(
            {
                "metric": "primary_rays_per_sec_per_chip_1080p_3bounce",
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / BASELINE_RAYS_PER_CHIP,
                "frame_ms": dt * 1e3,
                "chips": n_chips,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
