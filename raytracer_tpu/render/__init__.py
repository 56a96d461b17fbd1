from raytracer_tpu.render.integrator import render, render_depth, trace_rays

__all__ = ["render", "render_depth", "trace_rays"]
