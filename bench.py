"""Headline benchmark: primary rays/s on the north-star config.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...}

Config: 1920x1080, 3 reflection bounces, Reinhard tone mapping, the exact
BASELINE config-3 scene (sprint3: demo geometry + sun light — measuring the
demo scene without the sun under-counts two light-term evaluations per
level, VERDICT r3 weak-1). The north-star target is 1e9
primary rays/s on a v5e-8 (BASELINE.json), i.e. 0.125e9 per chip;
``vs_baseline`` is measured single-chip throughput over the per-chip target,
scaled by the local chip count.

Timing method (stall-proof, VERDICT r2 item 1): every number is the MEDIAN
of N>=3 independent timing chains. Each chain links its frames through a ~0
scalar data dependency (per-call ``block_until_ready`` through the remote-
dispatch tunnel measures round-trip latency, not device time) and syncs
once. The relay this TPU sits behind has intermittent multi-minute stalls;
a chain whose wall time exceeds 2x the median of its siblings is treated as
stalled and re-run (bounded retries). Per-chain spreads are reported in
``*_chains`` keys so the artifact shows its own noise floor.
"""

import json
import statistics
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
CHAINS = 3
BASELINE_RAYS_PER_CHIP = 1e9 / 8  # north star: 1e9 on a v5e-8


def median_chains(run_chain, n=CHAINS, retries=2):
    """Median of n independent chain timings, re-running stalled chains.

    ``run_chain() -> float`` (ms or s — units preserved). A chain is
    "stalled" when its value exceeds 2x the median of the other chains
    (the relay's multi-minute hiccups poison exactly one chain at a time);
    stalled chains are re-run up to ``retries`` times, then the median is
    taken over whatever survived.
    """
    vals = [run_chain() for _ in range(n)]
    for _ in range(retries):
        med = statistics.median(vals)
        bad = [i for i, v in enumerate(vals) if v > 2.0 * med]
        if not bad:
            break
        for i in bad:
            vals[i] = run_chain()
    return statistics.median(vals), [round(v, 3) for v in vals]


def main() -> None:
    n_chips = jax.device_count()
    scene = scenes.sprint3_scene()  # c3: demo geometry + sun (app/config.py)
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
    eps0 = jnp.float32(0)
    float(f(scene, camera, eps0))  # compile + warm

    def headline_chain():
        eps = eps0
        t0 = time.perf_counter()
        for _ in range(ITERS):
            eps = f(scene, camera, eps)
        float(eps)  # one sync for the whole chain
        return (time.perf_counter() - t0) / ITERS * 1e3  # ms/frame

    frame_ms, headline_chains = median_chains(headline_chain)
    rays_per_s = WIDTH * HEIGHT / (frame_ms * 1e-3)

    # Secondary metrics, each guarded so it can never break the headline
    # line, and budgeted so a relay stall can't starve the driver of the
    # artifact. bwd/fwd is measured WHERE IT HURTS (VERDICT r1 item 5):
    # the flagship 1080p/3-bounce frame on both the <32-prim custom-VJP
    # path (demo scene) and the >=32-prim mm-gather path (grid-64), plus
    # large-scene frame times (1024 spheres at 1080p/3 and the c5 4K/4)
    # and the BASELINE config-4 soft fit step (VERDICT r2 item 6).
    import os

    # 2100 s: the r5 extras list (3-way fwd/bwd x2, 5 frame workloads, 3
    # fit steps) measured 15-20 min end-to-end on a quiet host; 1500 s
    # left no headroom for one relay stall and would silently drop the
    # LAST extras (the soft-fit artifacts) from the driver record.
    budget_s = float(os.environ.get("BENCH_BUDGET_S", "2100"))
    start = time.perf_counter()
    extras: dict = {}

    def within_budget() -> bool:
        return time.perf_counter() - start < budget_s

    def extra(key, fn, chains=CHAINS):
        if not within_budget():
            return
        try:
            med, vals = median_chains(fn, n=chains)
            extras[key] = round(med, 3)
            if max(vals) > 1.2 * min(vals):
                extras[key + "_chains"] = vals  # show the noise floor
        except Exception:
            extras[key] = float("nan")

    from raytracer_tpu.utils.profiler import (
        benchmark_fit_step,
        benchmark_forward_backward,
        benchmark_render,
    )

    # Honest 3-way decomposition (VERDICT r4 item 1): pure fused forward /
    # residual-emitting training forward / true backward (= both - train),
    # timed as PAIRED rounds inside benchmark_forward_backward (one round
    # runs the three chains back-to-back, so the subtraction happens under
    # the same relay conditions — r4's independently-scheduled chains put
    # the grid-64 ratio spread at 2x). Ratio denominator = the inference
    # forward; the engine gap is visible as fwd_train_ms - fwd_ms.
    def extra_fwdbwd(suffix, sc, iters, rounds):
        if not within_budget():
            return
        try:
            r = benchmark_forward_backward(
                sc, camera, WIDTH, HEIGHT, depth=DEPTH,
                iters=iters, rounds=rounds,
            )
            extras["fwd_ms" + suffix] = round(r["forward_ms"], 3)
            extras["fwd_train_ms" + suffix] = round(r["forward_train_ms"], 3)
            extras["bwd_ms" + suffix] = round(r["backward_ms"], 3)
            extras["bwd_fwd_ratio" + suffix] = round(r["bwd_fwd_ratio"], 3)
            extras["bwd_fwd_ratio" + suffix + "_chains"] = (
                r["bwd_fwd_ratio_rounds"]
            )
        except Exception:
            extras["bwd_fwd_ratio" + suffix] = float("nan")

    # flagship: 3-prim demo (fused whole-trace fwd+bwd kernels). iters=25:
    # the true backward is ~1.6 ms, so per-round differences sit near the
    # relay's dispatch-noise floor at shorter chains (a 15-iter run showed
    # a 29% round spread where 25-iter runs hold under 10%).
    extra_fwdbwd("", scene, iters=25, rounds=7)
    grid64 = scenes.grid_sphere_scene(64)
    # >=32 prims: the per-level trace kernels + mm-gather backward
    extra_fwdbwd("_grid64", grid64, iters=12, rounds=5)
    extra(
        "frame_ms_grid64_1080p_d3",  # midsize fused-kernel artifact (r4)
        lambda: benchmark_render(
            grid64, camera, WIDTH, HEIGHT, depth=DEPTH, iters=10
        )["frame_ms"],
    )
    extra(
        "frame_ms_ref_demo_640_d10",  # the reference's TRUE default
        # workload: 640x640 (int-division aspect quirk), depth 10, demo
        # scene (/root/reference/main.cpp:22,25,89,156-163) — the "Nx the
        # reference" claim as a driver artifact (VERDICT r4 item 5).
        lambda: benchmark_render(
            scenes.reference_demo_scene(), camera, 640, 640,
            depth=10, iters=15
        )["frame_ms"],
    )
    grid1024 = scenes.grid_sphere_scene(1024)
    # iters raised 5 -> 15 / 3 -> 8 (r5): the device trace
    # (docs/grid1024_dispatch.md) shows chained frames execute BACK-TO-BACK
    # on-chip (36.39 ms each, zero inter-frame gap) — the wall overhead is
    # one fixed ~25 ms chain-startup round trip, so short chains inflated
    # the per-frame number by +5 ms (grid) / +8 ms (c5). Longer chains
    # report the true steady state.
    extra(
        "frame_ms_1024sphere_1080p_d3",  # VERDICT r1 item 1 artifact
        lambda: benchmark_render(
            grid1024, camera, WIDTH, HEIGHT, depth=DEPTH, iters=15
        )["frame_ms"],
    )
    extra(
        "frame_ms_c5_4k_1024sphere_d4",  # BASELINE config 5 artifact
        lambda: benchmark_render(
            grid1024, camera, 3840, 2160, depth=4, iters=8
        )["frame_ms"],
    )
    extra(
        "fit_step_ms_c4",  # BASELINE config 4: soft fit step, 1080p/64 sph
        lambda: benchmark_fit_step(
            grid64, camera, WIDTH, HEIGHT, depth=1, soft=True, iters=3
        )["step_ms"],
    )
    extra(
        "fit_step_ms_soft_1024sphere",  # r4: c5-scale fits on the kernel path
        lambda: benchmark_fit_step(
            grid1024, camera, WIDTH, HEIGHT, depth=1, soft=True, iters=2
        )["step_ms"],
    )
    extra(
        "fit_step_ms_soft_2048sphere",  # r5: past the old 1024 lane-slot
        # cliff — multi-plane cotangent accumulators keep 2048-sphere fits
        # on the kernel path (VERDICT r4 item 3).
        lambda: benchmark_fit_step(
            scenes.grid_sphere_scene(2048), camera, WIDTH, HEIGHT,
            depth=1, soft=True, iters=2
        )["step_ms"],
    )

    print(
        json.dumps(
            {
                "metric": "primary_rays_per_sec_per_chip_1080p_3bounce",
                "value": rays_per_s,
                "unit": "rays/s",
                "vs_baseline": rays_per_s / BASELINE_RAYS_PER_CHIP,
                "frame_ms": frame_ms,
                "frame_ms_chains": headline_chains,
                "chips": n_chips,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
