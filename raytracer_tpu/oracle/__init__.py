from raytracer_tpu.oracle.numpy_ref import render_oracle, trace_oracle

__all__ = ["render_oracle", "trace_oracle"]
