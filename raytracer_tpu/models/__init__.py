from raytracer_tpu.models import scenes

__all__ = ["scenes"]
