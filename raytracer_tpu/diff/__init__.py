"""Differentiable-rendering extensions: soft visibility for geometry fits."""

from raytracer_tpu.diff.soft import render_soft, trace_soft

__all__ = ["render_soft", "trace_soft"]
