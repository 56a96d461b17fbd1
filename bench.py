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
        return img.sum() * 1e-30  # ~0 chain scalar, forces frame completion

    f = jax.jit(step)
    eps = jnp.float32(0)
    float(f(scene, camera, eps))  # compile + warm

    t0 = time.perf_counter()
    for _ in range(ITERS):
        eps = f(scene, camera, eps)
    float(eps)  # one sync for the whole chain
    dt = (time.perf_counter() - t0) / ITERS

    rays_per_s = WIDTH * HEIGHT / dt

    # Secondary metric (BASELINE.json): backward/forward wall-time ratio on
    # the differentiable-fit parameterization, at a size that compiles fast.
    # Never let the secondary metric break the headline line.
    try:
        from raytracer_tpu.utils.profiler import benchmark_forward_backward

        fb = benchmark_forward_backward(scene, camera, 640, 480, depth=1, iters=5)
    except Exception:
        fb = {"bwd_fwd_ratio": float("nan")}

    print(
        json.dumps(
            {
                "metric": "primary_rays_per_sec_per_chip_1080p_3bounce",
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / BASELINE_RAYS_PER_CHIP,
                "frame_ms": dt * 1e3,
                "bwd_fwd_ratio": round(fb["bwd_fwd_ratio"], 3),
                "chips": n_chips,
            }
        )
    )


if __name__ == "__main__":
    main()
