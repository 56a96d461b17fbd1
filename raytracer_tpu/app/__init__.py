"""Application layer: configs, CLI, interactive viewer, fit driver."""

from raytracer_tpu.app.config import BASELINE_CONFIGS, RenderConfig

__all__ = ["RenderConfig", "BASELINE_CONFIGS"]
