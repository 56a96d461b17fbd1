"""Utilities: profiling, checkpointing, logging."""

from raytracer_tpu.utils.profiler import (
    PhaseTimer,
    benchmark_forward_backward,
    benchmark_render,
)

__all__ = ["PhaseTimer", "benchmark_render", "benchmark_forward_backward"]
